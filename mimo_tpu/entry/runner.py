"""Shared host-side runner: weights, reference-image prep, device calls.

Mirrors the model-loading/orchestration role of the reference's MIMO class
(run_edit.py:60-128 / run_animate.py:60-128) without the per-frame Python
loops: the host prepares fixed-size numpy batches once, the device runs one
compiled program.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.config import MIMOConfig
from mimo_tpu.models import clip_vision as CV
from mimo_tpu.models import pose_guider as PG
from mimo_tpu.models import unet as U
from mimo_tpu.models import vae as V
from mimo_tpu.pipelines import pose2vid
from mimo_tpu.utils import frames as FU
from mimo_tpu.weights import convert as W


def init_random_params(cfg: MIMOConfig, seed: int = 0,
                       dtype=jnp.bfloat16) -> Dict[str, Any]:
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    return {
        "reference_unet": U.unet_init(ks[0], cfg.reference_unet, dtype=dtype),
        "denoising_unet": U.unet_init(ks[1], cfg.denoising_unet, dtype=dtype),
        "pose_guider": PG.pose_guider_init(ks[2], cfg.pose_guider, dtype=dtype),
        "vae": V.vae_init(ks[3], cfg.vae, dtype=dtype),
        "clip": CV.clip_vision_init(ks[4], cfg.clip_vision, dtype=dtype),
    }


def load_params(path: str, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Load a converted .npz weight bundle (see weights/convert.py)."""
    tree = W.load_npz(path)
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), tree)


def segment_reference(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-image human matting.

    The reference runs a TF frozen-graph matting net (tools/human_segmenter.py:14-53,
    assets/matting_human.pb) and composites onto white (run_edit.py:17-27).
    That model's architecture is unpublished (SURVEY.md §2d item 5); here we
    use a self-contained luminance/border heuristic: estimate the background
    color from the image border; pixels far from it are foreground. Replace
    with the SAM-based segmenter from mimo_tpu.decomp when precision
    matters. Returns (rgb_on_white, mask[0/255]).
    """
    h, w = img.shape[:2]
    border = np.concatenate([
        img[0].reshape(-1, 3), img[-1].reshape(-1, 3),
        img[:, 0].reshape(-1, 3), img[:, -1].reshape(-1, 3)], axis=0)
    bg = np.median(border.astype(np.float32), axis=0)
    dist = np.linalg.norm(img.astype(np.float32) - bg, axis=-1)
    mask = (dist > 40).astype(np.uint8) * 255
    mask = FU.clean_mask(mask)
    out = img.copy()
    out[mask == 0] = 255
    return out, mask


def prep_reference_image(img: np.ndarray) -> np.ndarray:
    """segment → crop to person → pad to white square (run_edit.py:164-170)."""
    seg, mask = segment_reference(img)
    if mask.any():
        seg = FU.crop_img(seg, mask)
    seg, _ = FU.pad_img(seg, (255, 255, 255))
    return seg


@dataclass
class Runner:
    cfg: MIMOConfig
    params: Dict[str, Any]
    dtype: Any = jnp.bfloat16

    _cache: Dict[Any, Any] = None  # compiled generate() per static shape

    def __post_init__(self):
        self._cache = {}

    def _get_fn(self, st: pose2vid.Pose2VideoStatic):
        if st not in self._cache:
            jit_cache: Dict[str, Any] = {}

            def fn(p, a, b, c, d, e):
                return pose2vid.generate_host_loop(p, st, a, b, c, d, e,
                                                   jit_cache=jit_cache)

            self._cache[st] = fn
        return self._cache[st]

    def generate(self, ref_image: np.ndarray, pose_frames: List[np.ndarray],
                 bk_frames: List[np.ndarray], *, width: int, height: int,
                 steps: int, cfg_scale: float, seed: int,
                 window_chunk: Optional[int] = None,
                 interpolation_factor: int = 0) -> np.ndarray:
        """ref_image: (h, w, 3) uint8 prepared reference; pose/bk frames:
        uint8 lists (any size — resized here). Returns (F, height, width, 3)
        float in [0, 1]."""
        F = len(pose_frames)
        dt = self.dtype
        ref = FU.resize_frame(ref_image, width, height)
        ref = (ref.astype(np.float32) / 255.0) * 2.0 - 1.0
        pose = np.stack([FU.resize_frame(f, width, height)
                         for f in pose_frames]).astype(np.float32) / 255.0
        bk = np.stack([FU.resize_frame(f, width, height)
                       for f in bk_frames]).astype(np.float32) / 255.0
        bk = bk * 2.0 - 1.0
        cs = self.cfg.clip_vision.image_size
        clip_in = FU.resize_frame(ref_image, cs, cs).astype(np.float32) / 255.0
        clip_px = np.asarray(CV.clip_preprocess(jnp.asarray(clip_in)))

        ds = self.cfg.vae.downscale
        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (F, height // ds, width // ds, 4))

        st = pose2vid.Pose2VideoStatic(
            cfg=self.cfg, num_frames=F, height=height, width=width,
            num_inference_steps=steps, guidance_scale=cfg_scale,
            window_chunk=window_chunk,
            interpolation_factor=interpolation_factor)
        fn = self._get_fn(st)
        out = fn(self.params, jnp.asarray(ref, dt), jnp.asarray(pose, dt),
                 jnp.asarray(bk, dt), jnp.asarray(clip_px, dt),
                 jnp.asarray(noise, dt))
        return np.asarray(out.astype(jnp.float32))
