"""Checkpoint save/load + pruning."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.weights import checkpoint as CK
from mimo_tpu.weights.convert import save_npz, load_npz


def test_orbax_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3),
            "b": {"c": jnp.ones((4,), jnp.bfloat16)}}
    path = str(tmp_path / "ckpt")
    CK.save_orbax(tree, path)
    loaded = CK.load_orbax(path, target=jax.tree.map(np.asarray, tree))
    np.testing.assert_allclose(np.asarray(loaded["a"]), np.asarray(tree["a"]))
    assert loaded["b"]["c"].dtype == jnp.bfloat16 or \
        loaded["b"]["c"].dtype == np.dtype("bfloat16")


def test_keep_latest(tmp_path):
    for step in (10, 20, 30, 40):
        (tmp_path / f"checkpoint-{step}").mkdir()
    (tmp_path / "other").mkdir()
    CK.keep_latest(str(tmp_path), n_keep=2)
    left = sorted(os.listdir(tmp_path))
    assert "checkpoint-30" in left and "checkpoint-40" in left
    assert "checkpoint-10" not in left and "checkpoint-20" not in left
    assert "other" in left


def test_composite_back_feather_and_crossfade():
    """entry.edit.composite_back: feathered paste + shot cross-fade."""
    from mimo_tpu.entry.edit import composite_back
    F, H, W = 4, 64, 64
    video = np.zeros((F, 32, 32, 3), np.float32)
    video[...] = 1.0  # white generation
    context_list = [[0, 1], [1, 2, 3]]  # overlap on frame 1
    bbox = (16, 48, 16, 48)
    bbox_clip_list = [bbox, bbox]
    pad_info = [(32, 32, (0, 0, 0, 0))] * 5
    bk = [np.zeros((H, W, 3), np.uint8)] * F
    vid = [np.full((H, W, 3), 128, np.uint8)] * F
    out = composite_back(video[[0, 1, 1, 2, 3]], context_list,
                         bbox_clip_list, pad_info, bk, vid, None)
    assert len(out) == F
    # center of pasted region is the generated white
    assert (out[0][32, 32] > 200).all()
    # far corner stays background black
    assert (out[0][2, 2] < 30).all()
