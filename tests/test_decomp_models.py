"""Perception model zoo on tiny configs: ViT variants, DepthAnything DPT,
ViTPose head + decode, SAM encoder/decoder/predictor/automask."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import vit as VT
from mimo_tpu.decomp import depth_anything as DA
from mimo_tpu.decomp import vitpose as VP
from mimo_tpu.decomp import sam as SAM


def test_vit_plain():
    cfg = VT.ViTConfig(img_size=(32, 32), patch_size=16, dim=32, depth=2,
                       num_heads=4)
    p = VT.vit_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    t = VT.vit_apply(p, cfg, x)
    assert t.shape == (2, 4, 32)


def test_vit_cls_and_layerscale():
    cfg = VT.ViTConfig(img_size=(32, 32), patch_size=16, dim=32, depth=2,
                       num_heads=4, use_cls_token=True, layer_scale=True)
    p = VT.vit_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    t, inter = VT.vit_apply(p, cfg, x, return_intermediates=[0, 1])
    assert t.shape == (2, 5, 32)
    assert len(inter) == 2


def test_vit_windowed_relpos():
    cfg = VT.ViTConfig(img_size=(64, 64), patch_size=16, dim=32, depth=2,
                       num_heads=4, window_size=2, global_blocks=(1,),
                       use_rel_pos=True)
    p = VT.vit_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    t = VT.vit_apply(p, cfg, x)
    assert t.shape == (1, 16, 32)
    assert np.isfinite(np.asarray(t)).all()


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5 * 7, 8))
    w, padded = VT._window_partition(x, 5, 7, 3)
    back = VT._window_unpartition(w, 2, 5, 7, 3, padded)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_depth_anything_tiny():
    cfg = DA.tiny_depth_config()
    p = DA.depth_anything_init(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (30, 40, 3))
    d = DA.infer_depth(p, cfg, img, input_size=56)
    assert d.shape == (30, 40)
    assert np.isfinite(np.asarray(d)).all()
    assert (np.asarray(d) >= 0).all()


def test_vitpose_tiny_heatmaps_and_decode():
    cfg = VP.tiny_vitpose_config()
    p = VP.vitpose_init(jax.random.PRNGKey(0), cfg)
    crops = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 48, 3))
    hm = VP.heatmaps(p, cfg, crops)
    assert hm.shape == (2, 16, 12, cfg.num_keypoints)
    boxes = np.array([[0, 0, 48, 64], [10, 20, 96, 128]], np.float32)
    kpts = VP.decode_keypoints(np.asarray(hm), boxes)
    assert kpts.shape == (2, cfg.num_keypoints, 3)
    # keypoints inside their boxes
    assert (kpts[0, :, 0] >= 0).all() and (kpts[0, :, 0] <= 48).all()
    assert (kpts[1, :, 0] >= 10).all() and (kpts[1, :, 0] <= 106).all()


def test_decode_keypoints_peak():
    hm = np.zeros((1, 16, 12, 1), np.float32)
    hm[0, 5, 7, 0] = 1.0
    hm[0, 5, 8, 0] = 0.5  # pulls the refinement right
    kpts = VP.decode_keypoints(hm, np.array([[0, 0, 12, 16]], np.float32))
    assert abs(kpts[0, 0, 0] - 7.75) < 1e-6  # 7 + 0.25 offset + 0.5 center
    assert abs(kpts[0, 0, 1] - 5.5) < 1e-6
    assert kpts[0, 0, 2] == 1.0


def test_hand_boxes():
    k = np.zeros((133, 3))
    # left hand cluster
    k[-42:-21, 0] = np.linspace(10, 20, 21)
    k[-42:-21, 1] = np.linspace(30, 40, 21)
    k[-42:-21, 2] = 0.9
    left, right = VP.hand_boxes_from_keypoints(k)
    assert left is not None and right is None
    x0, y0, x1, y1 = left
    assert x0 < 10 and x1 > 20 and y0 < 30 and y1 > 40


def test_sam_encode_decode_tiny():
    cfg = SAM.tiny_sam_config()
    p = SAM.sam_init(jax.random.PRNGKey(0), cfg)
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    emb = SAM.encode_image(p, cfg, px)
    assert emb.shape == (1, 4, 4, cfg.prompt_dim)
    pts = jnp.asarray([[[0.5, 0.5]], [[0.2, 0.8]]])
    lbl = jnp.ones((2, 1), jnp.int32)
    masks, iou = SAM.decode_masks(p, cfg, emb[0],
                                  SAM.encode_points(p, pts, lbl))
    assert masks.shape == (2, cfg.num_mask_tokens, 16, 16)
    assert iou.shape == (2, cfg.num_mask_tokens)


def test_sam_predictor_and_automask():
    cfg = SAM.tiny_sam_config()
    p = SAM.sam_init(jax.random.PRNGKey(0), cfg)
    pred = SAM.SamPredictor(p, cfg)
    img = (np.random.default_rng(0).uniform(0, 255, (48, 64, 3))
           .astype(np.uint8))
    pred.set_image(img)
    masks, iou = pred.predict(points=np.array([[32.0, 24.0]]),
                              labels=np.array([1]))
    assert masks.shape == (cfg.num_mask_tokens, 48, 64)
    assert masks.dtype == bool

    masks2, iou2 = pred.predict(box=np.array([10, 10, 50, 40]))
    assert masks2.shape[0] == cfg.num_mask_tokens

    res = SAM.automatic_masks(pred, img, points_per_side=4,
                              pred_iou_thresh=-1e9, nms_iou=0.9)
    assert isinstance(res, list)
    for r in res:
        assert r["segmentation"].shape == (48, 64)


def test_mask_nms_dedup():
    a = np.zeros((10, 10), bool); a[:5] = True
    b = a.copy()
    c = np.zeros((10, 10), bool); c[:, :2] = True
    res = SAM.mask_nms([
        {"segmentation": a, "predicted_iou": 0.9, "area": 50},
        {"segmentation": b, "predicted_iou": 0.8, "area": 50},
        {"segmentation": c, "predicted_iou": 0.7, "area": 20},
    ], iou_thresh=0.7)
    assert len(res) == 2


def test_automask_device_nms_matches_host_oracle():
    """The device-matmul NMS in automatic_masks keeps exactly the set the
    reference-faithful host mask_nms keeps, given the same candidates.

    Synthetic low-res candidate logits with known overlap structure are
    pushed through the predictor's _nms_stats + the greedy walk (a
    re-statement of the automatic_masks internals), and the kept indices
    are compared against mask_nms run on the binarized full grids."""
    cfg = SAM.tiny_sam_config()
    p = SAM.sam_init(jax.random.PRNGKey(0), cfg)
    pred = SAM.SamPredictor(p, cfg)

    g4 = 16
    rng = np.random.default_rng(3)
    cand = np.full((6, g4, g4), -1.0, np.float32)
    cand[0, :8, :8] = 1.0          # base block
    cand[1, :8, :8] = 1.0          # exact duplicate -> dropped
    cand[2, :8, :10] = 1.0         # IoU 0.8 with 0 -> dropped at 0.7
    cand[3, 8:, 8:] = 1.0          # disjoint -> kept
    cand[4, :4, :4] = 1.0          # IoU 0.25 with 0 -> kept
    cand[5] = -1.0                 # empty -> dropped (area 0)
    iou_scores = np.array([0.95, 0.93, 0.92, 0.91, 0.90, 0.89])

    valid = np.ones((g4, g4), bool)
    areas, inter = pred._nms_stats(jnp.asarray(cand), jnp.asarray(valid))
    areas, inter = np.asarray(areas), np.asarray(inter)

    ok = areas > 0
    kept = []
    for i in np.argsort(-iou_scores, kind="stable"):
        if not ok[i]:
            continue
        dup = any(
            inter[i, j] / (areas[i] + areas[j] - inter[i, j]) > 0.7
            for j in kept
            if areas[i] + areas[j] - inter[i, j] > 0)
        if not dup:
            kept.append(int(i))

    oracle = SAM.mask_nms(
        [{"segmentation": cand[i] > 0, "area": int((cand[i] > 0).sum()),
          "predicted_iou": float(iou_scores[i]), "idx": i}
         for i in range(6) if (cand[i] > 0).any()], iou_thresh=0.7)
    assert kept == [r["idx"] for r in oracle] == [0, 3, 4]

    # the intersection matmul is exact integer counting
    bin_ = (cand > 0).reshape(6, -1).astype(np.float32)
    np.testing.assert_array_equal(inter, bin_ @ bin_.T)


def test_vitpose_flip_test_matches_oracle():
    """Flip-averaged heatmaps equal a numpy re-statement of the mmpose
    TopDown test path (flip image -> net -> flip_back channel swap +
    horizontal unflip -> one-pixel right shift -> average)."""
    cfg = VP.tiny_vitpose_config()
    p = VP.vitpose_init(jax.random.PRNGKey(0), cfg)
    pairs = [(1, 2), (3, 4)]
    crops = jax.random.normal(jax.random.PRNGKey(1),
                              (2, *cfg.backbone.img_size, 3))
    got = np.asarray(VP.heatmaps_flip_test(p, cfg, crops,
                                           flip_pairs=pairs))

    direct = np.asarray(VP.heatmaps(p, cfg, crops))
    flipped = np.asarray(VP.heatmaps(p, cfg, crops[:, :, ::-1]))
    # flip_back (post_transforms.py:110-148): swap pairs then mirror W
    back = flipped.copy()
    for a, b in pairs:
        back[..., a] = flipped[..., b]
        back[..., b] = flipped[..., a]
    back = back[:, :, ::-1]
    # shift_heatmap=True (topdown_heatmap_simple_head.py:222-224)
    shifted = back.copy()
    shifted[:, :, 1:] = back[:, :, :-1]
    want = (direct + shifted) * 0.5
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and the flip branch actually changes the result
    assert np.abs(got - direct).max() > 1e-6


def test_attn_plain_long_seq_dispatch_matches_short_path():
    """The flash-dispatch branch of _attn_plain (S >= 1024) must equal the
    reshape-based XLA path — on CPU the dispatcher falls back to the same
    dot_product_attention, so this pins the q/k/v slicing layout."""
    from mimo_tpu.decomp.vit import _attn_plain
    from mimo_tpu.models import layers as L

    d, heads, s, b = 32, 4, 1030, 2
    key = jax.random.PRNGKey(0)
    p = {"qkv": L.linear_init(key, d, 3 * d),
         "proj": L.linear_init(jax.random.PRNGKey(1), d, d)}
    x = jax.random.normal(jax.random.PRNGKey(2), (b, s, d))
    got = _attn_plain(p, x, heads)

    qkv = L.linear(p["qkv"], x).reshape(b, s, 3, heads, d // heads)
    o = jax.nn.dot_product_attention(qkv[:, :, 0], qkv[:, :, 1],
                                     qkv[:, :, 2])
    want = L.linear(p["proj"], o.reshape(b, s, d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
