"""Generate random-but-real-sized decomp weight bundles.

The published checkpoints (SAM ViT-H, SAM2.1 hiera-large, ViTPose-huge
wholebody, DepthAnythingV2-vitl, HMR2b, HaMeR, RAFT-things, ProPainter,
SMPL-H) are not in this image, so perf work on the decomposition half
uses randomly initialized parameters at the REAL architectures' sizes —
identical FLOPs and memory traffic to the real weights.

Usage: python tools/gen_decomp_weights.py /tmp/decomp_weights [--tiny]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# weight init is pure host work — never route the init ops through the
# remote TPU compile service (the env var alone does not override the
# axon plugin; this config call does)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _save(tree, path):
    from mimo_tpu.weights.convert import save_npz
    save_npz(jax.tree.map(lambda x: np.asarray(x, np.float32)
                          if hasattr(x, "dtype") and x.dtype != np.int64
                          else np.asarray(x), tree), path)
    sz = os.path.getsize(path) / 1e6
    print(f"  {os.path.basename(path):16s} {sz:8.1f} MB")


def gen_smpl(path, n_verts=6890, n_joints=52, n_betas=16, n_faces=13776):
    """Random SMPL-H-shaped arrays (real: V=6890, J=52 body+hands)."""
    rng = np.random.default_rng(0)
    kin = np.zeros((2, n_joints), np.int64)
    kin[0] = np.maximum(np.arange(n_joints) - 1, 0)  # chain; [0,0]=0 -> -1
    data = {
        "v_template": rng.standard_normal((n_verts, 3)) * 0.3,
        "shapedirs": rng.standard_normal((n_verts, 3, n_betas)) * 0.01,
        "posedirs": rng.standard_normal((n_verts, 3, 9 * (n_joints - 1)))
        * 0.001,
        "J_regressor": np.abs(rng.standard_normal((n_joints, n_verts)))
        / n_verts,
        "weights": np.abs(rng.standard_normal((n_verts, n_joints))),
        "kintree_table": kin,
        "f": rng.integers(0, n_verts, (n_faces, 3)),
    }
    data["weights"] /= data["weights"].sum(-1, keepdims=True)
    np.savez(path, **data)
    print(f"  {os.path.basename(path):16s} "
          f"{os.path.getsize(path) / 1e6:8.1f} MB")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decomp_weights"
    tiny = "--tiny" in sys.argv
    os.makedirs(out, exist_ok=True)
    key = jax.random.PRNGKey(0)

    from mimo_tpu.decomp import (sam as SAM, sam2 as SAM2, vitpose as VP,
                                 depth_anything as DA, hmr as HMR,
                                 raft as RAFT, propainter as PP)

    jobs = [
        ("sam.npz", lambda: SAM.sam_init(
            key, SAM.tiny_sam_config() if tiny else SAM.SAMConfig())),
        ("sam2.npz", lambda: SAM2.sam2_init(
            key, SAM2.tiny_sam2_config() if tiny else SAM2.SAM2Config())),
        ("vitpose.npz", lambda: VP.vitpose_init(
            key, VP.tiny_vitpose_config() if tiny else VP.ViTPoseConfig())),
        ("depth.npz", lambda: DA.depth_anything_init(
            key, DA.tiny_depth_config() if tiny else DA.DepthAnythingConfig())),
        ("hmr.npz", lambda: HMR.hmr_init(
            key, HMR.tiny_hmr_config() if tiny else HMR.HMRConfig())),
        ("hamer.npz", lambda: HMR.hmr_init(
            key, HMR.tiny_hmr_config() if tiny else HMR.hamer_config())),
        ("raft.npz", lambda: RAFT.raft_init(
            key, RAFT.tiny_raft_config() if tiny else RAFT.RAFTConfig())),
        ("propainter.npz", lambda: PP.propainter_init(
            key, PP.tiny_propainter_config() if tiny
            else PP.ProPainterConfig())),
    ]
    for name, fn in jobs:
        path = os.path.join(out, name)
        if os.path.exists(path):
            print(f"  {name:16s} exists, skip")
            continue
        t = time.time()
        tree = fn()
        _save(tree, path)
        print(f"    ({time.time() - t:.1f}s)")

    smpl_path = os.path.join(out, "smpl.npz")
    if not os.path.exists(smpl_path):
        if tiny:
            gen_smpl(smpl_path, n_verts=200, n_joints=52, n_faces=400)
        else:
            gen_smpl(smpl_path)
    print("done ->", out)


if __name__ == "__main__":
    main()
