"""Latent interpolation, matting, detector NMS, serving app plumbing."""

import numpy as np
import jax.numpy as jnp
import pytest

from mimo_tpu.pipelines import interp as I
from mimo_tpu.decomp import matting as M
from mimo_tpu.decomp import detector as D


def test_interpolate_factor1_noop():
    x = jnp.arange(24.0).reshape(2, 2, 2, 3)
    np.testing.assert_allclose(np.asarray(I.interpolate_latents(x, 1)),
                               np.asarray(x))


def test_interpolate_linear_counts_and_values():
    x = jnp.stack([jnp.zeros((2, 2, 1)), jnp.ones((2, 2, 1))])
    out = I.interpolate_latents(x, 2, mode="linear")
    assert out.shape[0] == 3
    np.testing.assert_allclose(np.asarray(out[1]), 0.5)


def test_slerp_endpoints_and_midpoint():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(I.slerp(a, b, 0.0)),
                               np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.slerp(a, b, 1.0)),
                               np.asarray(b), atol=1e-5)
    mid = I.slerp(a, b, 0.5)
    assert np.isfinite(np.asarray(mid)).all()


def test_slerp_parallel_falls_back_to_lerp():
    a = jnp.ones((3, 3))
    out = I.slerp(a, a * 2.0, 0.5)
    np.testing.assert_allclose(np.asarray(out), 1.5, atol=1e-5)


def test_heuristic_matting():
    img = np.full((60, 50, 3), 240, np.uint8)
    img[10:50, 15:35] = [50, 90, 160]
    rgba, found = M.heuristic_matting(img)
    assert found
    assert rgba.shape == (60, 50, 4)
    assert rgba[30, 25, 3] > 200      # person opaque
    assert rgba[5, 5, 3] < 50         # background transparent
    rgb = M.composite_on_white(rgba)
    assert (rgb[5, 5] > 230).all()


def test_box_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = D.box_nms(boxes, scores, iou_thresh=0.5)
    assert keep == [0, 2]


def test_pose_scored_detector():
    person = np.zeros((40, 40), bool)
    person[5:35, 10:30] = True

    def automask(frame):
        small = np.zeros((40, 40), bool)
        small[0:3, 0:3] = True
        return [{"segmentation": small}, {"segmentation": person}]

    def pose(frame, bbox):
        k = np.zeros((133, 3))
        k[:17, 2] = 0.8
        return k

    det = D.PoseScoredDetector(automask=automask, estimate_pose=pose)
    out = det(np.zeros((40, 40, 3), np.uint8))
    assert out is not None
    bbox, score = out
    assert score > 0.7
    assert list(bbox) == [10, 5, 29, 34]


def test_webapp_templates_and_gradio_gate(tmp_path):
    from mimo_tpu.serving.app import WebApp, build_app
    root = tmp_path / "tpls"
    (root / "a").mkdir(parents=True)
    (root / "a" / "sdc.mp4").write_bytes(b"x")
    (root / "b").mkdir()
    app = WebApp(template_root=str(root))
    assert app.templates() == ["a"]
    with pytest.raises(RuntimeError, match="gradio"):
        build_app(app)
