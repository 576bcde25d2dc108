"""Wire converted weights into a ready-to-run DecompModels bundle.

This is the composition root for the decomposition half: given a directory
of converted .npz weight bundles (produced by weights/convert_decomp.py /
weights/convert.py), builds the callables that
decomp.pipeline.VideoProcessor consumes. Any missing bundle leaves its
stage disabled (graceful degradation, matching the reference's optional
occ stage — run_edit.py:136-137).

Expected files in `weights_dir` (all optional):
  sam.npz        — SAM ViT-H (first-frame segmentation + auto-masks)
  sam2.npz       — video tracker
  vitpose.npz    — wholebody 2D pose
  depth.npz      — DepthAnythingV2
  hmr.npz        — HMR2 body regression
  hamer.npz      — HaMeR hand regression
  smpl.npz/.pkl  — SMPL-H model arrays
  raft.npz, propainter.npz — background inpainting
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.decomp import depth_anything as DA
from mimo_tpu.decomp import hmr as HMR
from mimo_tpu.decomp import motion as MO
from mimo_tpu.decomp import pipeline as DP
from mimo_tpu.decomp import propainter as PP
from mimo_tpu.decomp import raft as RAFT
from mimo_tpu.decomp import sam as SAM
from mimo_tpu.decomp import sam2 as SAM2
from mimo_tpu.decomp import smpl as SM
from mimo_tpu.decomp import vitpose as VP
from mimo_tpu.decomp.occlusion import sample_mask_points
from mimo_tpu.weights.convert import load_npz


def _maybe(path: str, dtype=None):
    """Load an npz bundle as DEVICE arrays. load_npz returns host numpy
    arrays, which silently work in eager ops but break under jit whenever
    a param is indexed with a traced array (np.asarray on a tracer — hit
    by SAM's rel-pos tables). Float params are cast to `dtype` when given
    (bf16 inference, matching the reference's autocast)."""
    if not os.path.exists(path):
        return None

    def leaf(x):
        if x is None:
            return None
        arr = np.asarray(x)
        if not np.issubdtype(arr.dtype, np.number):
            # structural metadata (e.g. the depth head's resize 'kind'
            # strings) stays host-side
            return arr.item() if arr.ndim == 0 else arr
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            # cast on the HOST: uploading f32 and casting on device ships
            # 2x the bytes through the tunnel — the first program call
            # blocks on the weight transfer (SAM's 2.4 GB f32 bundle
            # measured minutes of first-call stall in the occ ledger)
            arr = arr.astype(dtype)
        return jnp.asarray(arr)

    return jax.tree.map(leaf, load_npz(path))


def build_decomp_models(weights_dir: str, dtype=jnp.bfloat16,
                        tiny: bool = False,
                        only: Optional[set] = None,
                        mesh=None) -> DP.DecompModels:
    """tiny=True pairs with `gen_decomp_weights.py --tiny` bundles (the
    CPU smoke-test sizes); default configs are the real architectures.

    `only` restricts which weight bundles load (names from the module
    docstring, e.g. {"sam", "sam2"}): the full zoo is ~6 GB of bf16
    device weights — more than half a v5e chip — so single-stage runs
    (tools/profile_decomp.py) must not pay for models they never call.

    `mesh` (a 1-D jax.sharding.Mesh with a "data" axis) turns on
    frame-parallel data sharding for the per-frame model forwards
    (ViTPose, HMR2, HaMeR, the SDC rasterizer) — BASELINE.json config 5
    ("frames data-parallel sharded across a v5e-8 mesh"). Weights
    replicate; frame batches split; numerics match the single-device
    path per sample (parallel/decomp.py).
    """
    models = DP.DecompModels()
    if mesh is not None:
        from mimo_tpu.parallel.decomp import frame_parallel
    else:
        frame_parallel = None

    def _want(name: str) -> bool:
        return only is None or name in only

    sam_params = _maybe(os.path.join(weights_dir, "sam.npz"), dtype) \
        if _want("sam") else None
    if sam_params is not None:
        sam_cfg = SAM.tiny_sam_config() if tiny else SAM.SAMConfig()
        predictor = SAM.SamPredictor(sam_params, sam_cfg)

        def segment_box(frame, bbox):
            predictor.set_image(frame)
            masks, iou = predictor.predict(box=bbox)
            return masks[int(np.argmax(iou))]

        models.segment_box = segment_box
        models.automask = lambda frame: SAM.automatic_masks(
            predictor, frame, points_per_side=32)

    sam2_params = _maybe(os.path.join(weights_dir, "sam2.npz"), dtype) \
        if _want("sam2") else None
    if sam2_params is not None:
        s2cfg = SAM2.tiny_sam2_config() if tiny else SAM2.SAM2Config()

        # One predictor reused across calls: the occ stage tracks EVERY
        # occluder seed through the same clip (occlusion.py
        # extract_occlusion_video) — re-running init_state's 48-frame
        # Hiera-large encode per seed would repeat the single most
        # expensive model call in the stage. The video encode is cached
        # keyed on the frames object; only prompting + propagation run
        # per seed (reference keeps one inference_state the same way,
        # demo_occ.py:405-504).
        s2pred = SAM2.SAM2VideoPredictor(sam2_params, s2cfg)
        s2key: list = [None]

        def track(frames, seed_mask, seed_frame):
            # id() alone can collide after garbage collection; a cheap
            # content fingerprint of the first/last frames disambiguates
            f0, fl = np.asarray(frames[0]), np.asarray(frames[-1])
            key = (id(frames), len(frames), f0.shape,
                   int(f0[::16, ::16].sum()), int(fl[::16, ::16].sum()))
            if s2key[0] != key:
                s2pred.init_state(list(frames))
                s2key[0] = key
            pts = sample_mask_points(seed_mask, n=5)
            s2pred.add_new_points(seed_frame, pts,
                                  np.ones(len(pts), np.int32))
            fwd = s2pred.propagate_in_video(reverse=False)
            bwd = s2pred.propagate_in_video(reverse=True)
            return fwd | bwd

        models.track_video = track

    vp_params = _maybe(os.path.join(weights_dir, "vitpose.npz"), dtype) \
        if _want("vitpose") else None
    vp_cfg = VP.tiny_vitpose_config() if tiny else VP.ViTPoseConfig()
    if vp_params is not None:

        # params as an explicit jit argument (closure constants embed into
        # the HLO — slow remote compiles, no cache reuse across weights)
        _hm = lambda p, c: VP.heatmaps_flip_test(p, vp_cfg, c)
        hm_fn = jax.jit(frame_parallel(_hm, mesh) if mesh is not None
                        else _hm)

        def estimate_pose(frame, bbox):
            crop, cs = HMR.square_crop(frame, bbox,
                                       out_size=vp_cfg.backbone.img_size)
            hm = hm_fn(vp_params, jnp.asarray(crop[None], dtype))
            half = cs[2] / 2
            box = np.array([[cs[0] - half, cs[1] - half, cs[2], cs[2]]])
            return VP.decode_keypoints(np.asarray(hm, np.float32), box)[0]

        models.estimate_pose = estimate_pose

        def estimate_pose_batch(frames, bboxes, batch: int = 8):
            """Whole-clip pose: crop every frame host-side, run the
            flip-test heatmaps in fixed-size padded batches (ONE compiled
            program shape), decode all at once. The per-frame path costs
            two B=1 ViT-huge dispatches/frame through the 35 ms tunnel —
            the round-4 ledger's 134.6 s / 48f pose stage (VERDICT weak
            #2; reference batches crops the same way,
            mmpose/apis/inference.py:295)."""
            crops, boxes_xywh = [], []
            for f, bb in zip(frames, bboxes):
                c, cs = HMR.square_crop(f, np.asarray(bb),
                                        out_size=vp_cfg.backbone.img_size)
                crops.append(c)
                half = cs[2] / 2
                boxes_xywh.append([cs[0] - half, cs[1] - half, cs[2], cs[2]])
            crops = np.stack(crops)
            # dispatch every chunk before downloading any heatmaps: the
            # download inside the loop serialized chunk i's transfer
            # against chunk i+1's dispatch
            hms, pads = [], []
            for i in range(0, len(crops), batch):
                chunk = crops[i:i + batch]
                pad = batch - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.broadcast_to(chunk[-1:],
                                                (pad,) + chunk.shape[1:])])
                hms.append(hm_fn(vp_params, jnp.asarray(chunk, dtype)))
                pads.append(pad)
            hms = [np.asarray(hm, np.float32)[:batch - pad or None]
                   for hm, pad in zip(hms, pads)]
            return VP.decode_keypoints(
                np.concatenate(hms), np.asarray(boxes_xywh, np.float32))

        models.estimate_pose_batch = estimate_pose_batch

        if models.automask is not None:
            from mimo_tpu.decomp.detector import PoseScoredDetector
            models.detect_person = PoseScoredDetector(
                automask=models.automask, estimate_pose=estimate_pose)

    depth_params = _maybe(os.path.join(weights_dir, "depth.npz"), dtype) \
        if _want("depth") else None
    if depth_params is not None:
        dcfg = DA.tiny_depth_config() if tiny else DA.DepthAnythingConfig()
        # jitted (arrays as arguments): eager per-op dispatch costs ~35 ms
        # per call through the axon tunnel; one compiled call per frame
        # shape instead. The bundle's few STRING leaves (DPT resize 'kind'
        # metadata) can't be jit operands — they stay closure constants
        # (scalars, harmless), only the weight arrays ride as arguments.
        d_leaves, d_tree = jax.tree.flatten(depth_params)
        d_is_arr = [hasattr(l, "dtype") for l in d_leaves]
        d_arrs = [l for l, a in zip(d_leaves, d_is_arr) if a]

        def _depth_rebuild(arrs):
            it = iter(arrs)
            return jax.tree.unflatten(
                d_tree, [next(it) if a else l
                         for l, a in zip(d_leaves, d_is_arr)])

        depth_fn = jax.jit(
            lambda arrs, im: DA.infer_depth(_depth_rebuild(arrs), dcfg, im))
        models.depth = lambda frame: np.asarray(depth_fn(
            d_arrs, jnp.asarray(frame, jnp.float32) / 255.0))

    hmr_params = _maybe(os.path.join(weights_dir, "hmr.npz"), dtype) \
        if _want("hmr") else None
    smpl_path = next((p for p in (
        os.path.join(weights_dir, "smpl.npz"),
        os.path.join(weights_dir, "smpl.pkl")) if os.path.exists(p)), None)
    if hmr_params is not None and smpl_path is not None:
        smpl_model = (SM.load_smpl_npz(smpl_path)
                      if smpl_path.endswith(".npz")
                      else SM.load_smpl_pickle(smpl_path))
        sdc_path = os.path.join(weights_dir, "sdc_info.npy")
        sdc_colors = np.load(sdc_path) if os.path.exists(sdc_path) else None
        est = MO.MotionEstimator(
            vitpose_params=vp_params, vitpose_cfg=vp_cfg,
            hmr_params=hmr_params,
            hmr_cfg=HMR.tiny_hmr_config() if tiny else HMR.HMRConfig(),
            hamer_params=_maybe(os.path.join(weights_dir, "hamer.npz"),
                                dtype) if _want("hamer") else None,
            hamer_cfg=HMR.tiny_hmr_config() if tiny else HMR.hamer_config(),
            smpl_model=smpl_model, sdc_colors=sdc_colors, mesh=mesh)
        models.estimate_motion = est.estimate_motion

    raft_params = _maybe(os.path.join(weights_dir, "raft.npz"), dtype) \
        if _want("raft") else None
    pp_params = _maybe(os.path.join(weights_dir, "propainter.npz"), dtype) \
        if _want("propainter") else None
    if raft_params is not None and pp_params is not None:
        pcfg = PP.tiny_propainter_config() if tiny else PP.ProPainterConfig()
        rcfg = RAFT.tiny_raft_config() if tiny else RAFT.RAFTConfig()

        def inpaint(frames01, masks):
            return PP.inpaint_video(pp_params, pcfg, raft_params, rcfg,
                                    jnp.asarray(frames01, dtype),
                                    jnp.asarray(masks, dtype))

        models.inpaint = inpaint

    return models


def main():
    import argparse
    ap = argparse.ArgumentParser(
        description="MIMO-TPU template extraction (video_decomp/run.py role)")
    ap.add_argument("--video", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--weights-dir", required=True)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--max-frames", type=int, default=150)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny test configs (gen_decomp_weights.py --tiny)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (overrides the TPU plugin)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    models = build_decomp_models(args.weights_dir, tiny=args.tiny)
    cfg = DP.DecompConfig(target_fps=args.fps, max_frames=args.max_frames)
    vp = DP.VideoProcessor(models, cfg)
    result = vp.run(args.video, args.output)
    code = result["code"]
    msgs = {
        DP.CODE_OK: "ok",
        DP.CODE_NO_PERSON: "no person detected",
        DP.CODE_PERSON_TOO_SMALL: "person too small",
        DP.CODE_HALF_BODY: "person not fully visible",
    }
    print(f"decomposition: {msgs.get(code, code)} -> {args.output}")
    if code != DP.CODE_OK:
        raise SystemExit(code)


if __name__ == "__main__":
    main()
