"""Web serving app — the reference's Gradio UI (app.py:27-467 `WebApp`:
preset template gallery, reference-image upload, run button).

Gradio is not part of this image's baked dependencies, so the UI layer is
import-gated; `build_app()` raises a clear error without it while
`run_process()` (the actual serving entry the UI calls, mirroring
app.py:387-409) stays importable and testable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from mimo_tpu.config import MIMOConfig
from mimo_tpu.entry import edit as EDIT
from mimo_tpu.entry.runner import Runner, init_random_params, load_params
from mimo_tpu.utils import video_io as VIO


@dataclass
class WebApp:
    template_root: str
    weights_path: Optional[str] = None
    width: int = 784
    height: int = 784
    steps: int = 25
    cfg_scale: float = 3.5
    seed: int = 42
    _runner: Optional[Runner] = None

    def templates(self) -> List[str]:
        if not os.path.isdir(self.template_root):
            return []
        return sorted(
            d for d in os.listdir(self.template_root)
            if os.path.exists(os.path.join(self.template_root, d,
                                           "sdc.mp4")))

    def runner(self) -> Runner:
        if self._runner is None:
            cfg = MIMOConfig()
            params = (load_params(self.weights_path) if self.weights_path
                      else init_random_params(cfg))
            self._runner = Runner(cfg=cfg, params=params)
        return self._runner

    def run_process(self, ref_image: np.ndarray, template_name: str,
                    out_path: str) -> str:
        """The serving entry (reference app.py:387-409 → MIMO.run)."""
        template = os.path.join(self.template_root, template_name)
        frames = EDIT.edit(self.runner(), ref_image, template,
                           width=self.width, height=self.height,
                           steps=self.steps, cfg_scale=self.cfg_scale,
                           seed=self.seed)
        fps = 30
        cfg_file = os.path.join(template, "config.json")
        if os.path.exists(cfg_file):
            import json
            fps = json.load(open(cfg_file)).get("fps", 30)
        VIO.save_video(frames, out_path, fps=fps)
        return out_path


def build_app(webapp: WebApp):
    """Construct the Gradio Blocks UI (raises if gradio is unavailable)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this environment; use "
            "mimo_tpu.entry.edit / animate CLIs instead") from e

    names = webapp.templates()

    def _preview(name):
        """Gallery tile: the tracked source if present, else the pose video
        (reference app.py:374-378 shows motion_dir preview mp4s)."""
        d = os.path.join(webapp.template_root, name)
        for f in ("vid.mp4", "sdc.mp4"):
            p = os.path.join(d, f)
            if os.path.exists(p):
                return p
        return None

    with gr.Blocks(title="MIMO-TPU") as demo:
        gr.Markdown("# MIMO-TPU — controllable character video synthesis")
        # guidance block (reference app.py:413-421)
        with gr.Accordion(label="Guidance", open=True):
            gr.Markdown(
                "- **step 1:** upload a character image\n"
                "- **step 2:** choose a motion template from the gallery\n"
                "- **step 3:** click Run\n"
                "- Note: the character image should be full-body, "
                "front-facing, no occlusion, no handheld objects")
        selected = gr.State(names[0] if names else None)
        with gr.Row():
            ref = gr.Image(label="Input image")
            with gr.Column():
                # preset template gallery with preview videos
                # (reference app.py:371-385 get_template/_update_selection)
                gallery = gr.Gallery(
                    label="Gallery", columns=2, height=500,
                    value=[(_preview(n), n) for n in names],
                    show_label=True,
                    selected_index=0 if names else None)
                btn = gr.Button("Run", variant="primary")
            out = gr.Video(label="Generated Result", autoplay=True)

        def _select(evt: gr.SelectData):
            return names[evt.index]

        gallery.select(_select, inputs=[], outputs=[selected])

        def _run(img, tpl):
            path = "/tmp/mimo_tpu_out.mp4"
            return webapp.run_process(np.asarray(img), tpl, path)

        btn.click(_run, inputs=[ref, selected], outputs=[out])
    return demo


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--templates", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    app = WebApp(template_root=args.templates, weights_path=args.weights)
    build_app(app).launch(server_port=args.port)


if __name__ == "__main__":
    main()
