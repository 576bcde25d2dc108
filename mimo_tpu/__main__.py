"""Top-level CLI dispatcher: python -m mimo_tpu <command> ...

Commands mirror the reference entry points (run_animate.py, run_edit.py,
video_decomp/run.py, app.py):

  animate   character image animation from an sdc template
  edit      video character replacement with full compositing
  decomp    in-the-wild video -> template extraction
  serve     gradio web app (if gradio is installed)
  bench     headline benchmark (one JSON line)
"""

import sys


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        raise SystemExit(0)
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd == "animate":
        from mimo_tpu.entry.animate import main as m
        m(argv)
    elif cmd == "edit":
        from mimo_tpu.entry.edit import main as m
        m(argv)
    elif cmd == "decomp":
        sys.argv = [sys.argv[0]] + argv
        from mimo_tpu.decomp.factory import main as m
        m()
    elif cmd == "serve":
        sys.argv = [sys.argv[0]] + argv
        from mimo_tpu.serving.app import main as m
        m()
    elif cmd == "bench":
        import runpy
        import os
        sys.argv = [sys.argv[0]] + argv
        runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"), run_name="__main__")
    else:
        print(f"unknown command: {cmd}\n{__doc__}")
        raise SystemExit(2)


if __name__ == "__main__":
    main()
