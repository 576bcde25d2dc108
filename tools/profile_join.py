"""Join the latest step trace with the step HLO: print top device ops WITH
their HLO definition (op kind, shape, operands) so opaque fusion names
become actionable.

Usage:
  python tools/dump_step_hlo.py          # writes /tmp/step_hlo.txt
  python tools/profile_join.py [N]       # top N (default 50)
"""

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from jax.profiler import ProfileData
    paths = sorted(glob.glob("/tmp/step_trace/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    full = defaultdict(float)
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                full[ev.name.split(" ")[0]] += ev.duration_ns / 1e6

    defs = {}
    if os.path.exists("/tmp/step_hlo.txt"):
        for ln in open("/tmp/step_hlo.txt"):
            s = ln.strip()
            m = re.match(r"(?:ROOT )?%?([\w.-]+) = ", s)
            if m:
                defs.setdefault(m.group(1), s)

    for name, ms in sorted(full.items(), key=lambda kv: -kv[1])[:n]:
        base = name.lstrip("%")
        d = defs.get(base, "")
        print(f"{ms:9.1f} ms  {name}")
        if d:
            print(f"             {d[:240]}")


if __name__ == "__main__":
    main()
