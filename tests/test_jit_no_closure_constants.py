"""Weights must ride jitted decomp entry points as ARGUMENTS.

Closure-captured jax.Arrays are embedded into the lowered HLO as literal
constants: for the real ViT-huge bundles that balloons the (remote, very
slow) TPU compile — XLA was observed constant-folding f32[1280,5120]
weight converts — and defeats the persistent compile cache whenever the
weight VALUES change (random-weight runs never hit cache). These tests
pin the fixed pattern by asserting the traced jaxprs carry no large
closure constants (config scalars / tiny tables are fine).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mimo_tpu.decomp import hmr as HM
from mimo_tpu.decomp import motion as MO
from mimo_tpu.decomp import sam as SAM
from mimo_tpu.decomp import smpl as SM
from mimo_tpu.decomp import vitpose as VP

LIMIT = 1 << 20  # 1 MB of closure constants ≈ "no weights captured"


def _const_bytes(jaxpr):
    return sum(np.asarray(c).nbytes for c in jaxpr.consts
               if hasattr(c, "shape"))


def test_sam_predictor_jits_take_params_as_args():
    cfg = SAM.tiny_sam_config()
    p = SAM.sam_init(jax.random.PRNGKey(0), cfg)
    pred = SAM.SamPredictor(p, cfg)
    px = jnp.zeros((1, cfg.encoder.img_size[0], cfg.encoder.img_size[0], 3))
    assert _const_bytes(jax.make_jaxpr(pred._encode)(p, px)) < LIMIT

    emb = jnp.zeros((4, 4, cfg.prompt_dim))
    pts = jnp.zeros((2, 1, 2))
    lbl = jnp.ones((2, 1), jnp.int32)
    assert _const_bytes(jax.make_jaxpr(pred._decode)(p, emb, pts, lbl)) \
        < LIMIT


def test_motion_estimator_jits_take_params_as_args():
    hmr_cfg = HM.tiny_hmr_config(num_joints=5)
    vp_cfg = VP.tiny_vitpose_config()
    est = MO.MotionEstimator(
        vitpose_params=VP.vitpose_init(jax.random.PRNGKey(1), vp_cfg),
        vitpose_cfg=vp_cfg,
        hmr_params=HM.hmr_init(jax.random.PRNGKey(2), hmr_cfg),
        hmr_cfg=hmr_cfg,
        smpl_model=SM.random_test_model(jax.random.PRNGKey(0)),
        focal=100.0,
    )
    hs, ws = np.broadcast_to(np.asarray(hmr_cfg.backbone.img_size), (2,))
    crops = jnp.zeros((1, int(hs), int(ws), 3))
    assert _const_bytes(
        jax.make_jaxpr(est._hm_fwd)(est.hmr_params, crops)) < LIMIT
