"""End-to-end tiny pipeline tests + mesh-sharding equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mimo_tpu import config as C
from mimo_tpu.models import unet as U
from mimo_tpu.models import vae as V
from mimo_tpu.models import clip_vision as CV
from mimo_tpu.models import pose_guider as PG
from mimo_tpu.pipelines import pose2vid


def tiny_params(cfg, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    return {
        "reference_unet": U.unet_init(ks[0], cfg.reference_unet),
        "denoising_unet": U.unet_init(ks[1], cfg.denoising_unet),
        "pose_guider": PG.pose_guider_init(ks[2], cfg.pose_guider),
        "vae": V.vae_init(ks[3], cfg.vae),
        "clip": CV.clip_vision_init(ks[4], cfg.clip_vision),
    }


def tiny_inputs(cfg, F, H, W, key=1):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    ds = cfg.vae.downscale
    ref = jax.random.uniform(ks[0], (H, W, 3)) * 2 - 1
    pose = jax.random.uniform(ks[1], (F, H, W, 3))
    bk = jax.random.uniform(ks[2], (F, H, W, 3)) * 2 - 1
    clip_px = jax.random.normal(
        ks[3], (cfg.clip_vision.image_size, cfg.clip_vision.image_size, 3))
    noise = jax.random.normal(ks[4], (F, H // ds, W // ds, 4))
    return ref, pose, bk, clip_px, noise


def test_generate_end_to_end_tiny():
    cfg = C.tiny_mimo_config()
    F, H, W = 6, 32, 32
    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5)
    params = tiny_params(cfg)
    inputs = tiny_inputs(cfg, F, H, W)
    video = pose2vid.generate_fn(params, st, *inputs)
    assert video.shape == (F, H, W, 3)
    v = np.asarray(video)
    assert np.isfinite(v).all()
    assert v.min() >= 0.0 and v.max() <= 1.0


def test_window_chunking_equivalent():
    """Chunked window execution must match all-at-once exactly."""
    cfg = C.tiny_mimo_config()
    F, H, W = 10, 32, 32  # context 4, overlap 1 -> multiple windows
    params = tiny_params(cfg)
    inputs = tiny_inputs(cfg, F, H, W)

    st_all = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5, pad_windows_to=2)
    wins, _ = pose2vid.make_windows(st_all)
    st_chunk = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5, pad_windows_to=2, window_chunk=wins.shape[0] // 2)

    v_all = np.asarray(pose2vid.generate_fn(params, st_all, *inputs))
    v_chunk = np.asarray(pose2vid.generate_fn(params, st_chunk, *inputs))
    np.testing.assert_allclose(v_all, v_chunk, atol=2e-5)


def test_host_loop_matches_scan_generate():
    """generate_host_loop (python step loop) must match the scanned
    generate_fn exactly."""
    cfg = C.tiny_mimo_config()
    F, H, W = 6, 32, 32
    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5)
    params = tiny_params(cfg)
    inputs = tiny_inputs(cfg, F, H, W)
    a = np.asarray(pose2vid.generate_fn(params, st, *inputs))
    b = np.asarray(pose2vid.generate_host_loop(params, st, *inputs))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_no_cfg_path():
    cfg = C.tiny_mimo_config()
    F, H, W = 4, 32, 32
    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=1,
        guidance_scale=1.0)
    params = tiny_params(cfg)
    video = pose2vid.generate_fn(params, st, *tiny_inputs(cfg, F, H, W))
    assert video.shape == (F, H, W, 3)
    assert np.isfinite(np.asarray(video)).all()


def test_sharded_matches_single_device():
    """Window batch sharded over an 8-device CPU mesh must match the
    unsharded result (BASELINE north star: stable outputs across chip
    counts)."""
    cfg = C.tiny_mimo_config()
    F, H, W = 10, 32, 32
    params = tiny_params(cfg)
    inputs = tiny_inputs(cfg, F, H, W)
    ndev = len(jax.devices())
    assert ndev == 8, f"conftest should force 8 cpu devices, got {ndev}"

    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5, pad_windows_to=ndev)
    st_sharded = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5, pad_windows_to=ndev, mesh_axis="data")

    baseline = np.asarray(pose2vid.generate_fn(params, st, *inputs))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    repl = NamedSharding(mesh, P())
    params_r = jax.device_put(params, repl)
    inputs_r = jax.device_put(inputs, repl)
    with jax.set_mesh(mesh):
        sharded = np.asarray(jax.jit(
            lambda p, a, b, c, d, e: pose2vid.generate_fn(
                p, st_sharded, a, b, c, d, e)
        )(params_r, *inputs_r))
    np.testing.assert_allclose(baseline, sharded, atol=2e-5)


def test_frame_sharded_matches_single_device():
    """Frame-axis parallelism (the flagship single-window path, VERDICT r2
    #3): frames sharded over the 8-device CPU mesh through VAE/pose/UNet
    via shard_map, temporal attention resharding via all-to-all (or the
    all-gather fallback when S doesn't divide the mesh — the tiny config's
    deeper levels hit exactly that branch). Must match unsharded output."""
    import dataclasses
    cfg = C.tiny_mimo_config()
    # one window: context_frames >= F
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, context_frames=8))
    F, H, W = 8, 32, 32
    params = tiny_params(cfg)
    inputs = tiny_inputs(cfg, F, H, W)
    ndev = len(jax.devices())
    assert ndev == 8

    st = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5)
    windows, _ = pose2vid.make_windows(st)
    assert windows.shape[0] == 1, "test needs the single-window shape"
    baseline = np.asarray(pose2vid.generate_fn(params, st, *inputs))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    st_fs = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=2,
        guidance_scale=3.5, frame_axis="data", mesh=mesh)
    repl = NamedSharding(mesh, P())
    params_r = jax.device_put(params, repl)
    inputs_r = jax.device_put(inputs, repl)
    sharded = np.asarray(jax.jit(
        lambda p, a, b, c, d, e: pose2vid.generate_fn(
            p, st_fs, a, b, c, d, e)
    )(params_r, *inputs_r))
    np.testing.assert_allclose(baseline, sharded, atol=2e-5)


def test_hybrid_tail_no_padded_compute():
    """Ragged window counts in window-DP mode must not burn FLOPs on
    weight-0 padded windows (VERDICT r3 weak #4): full mesh-width chunks
    run window-DP and the remainder runs as ONE frame-sharded call. Checks
    (a) numerical equivalence with the unsharded pipeline and (b) the
    compiled per-device step program has measurably fewer FLOPs than the
    padded formulation.

    Uses a 4-device sub-mesh: on the tiny 32×32 config the deep UNet
    levels have S ∈ {16, 4, 1}, and at 8 devices the S=4 level takes the
    all-gather temporal fallback whose full-duplication overhead swamps
    the tiny-shape ledger (production S = 6272/1568/392 all divide 8 and
    take the a2a branch — test_reshard_branch_production_shapes). At 4
    devices only the trivial S=1 level falls back."""
    import dataclasses
    import functools
    from mimo_tpu.schedulers.ddim import DDIM

    cfg = C.tiny_mimo_config()
    # 13 windows of 8 frames: stride 4 over 52 frames -> 12 DP + 1 tail on
    # the 4-device mesh; cs=8 divides the mesh as required for the tail
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, context_frames=8, context_overlap=4))
    F, H, W = 52, 32, 32
    params = tiny_params(cfg)
    inputs = tiny_inputs(cfg, F, H, W)
    ndev = 4
    assert len(jax.devices()) >= ndev

    mesh = Mesh(np.array(jax.devices()[:ndev]), ("data",))
    st_plain = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=1,
        guidance_scale=3.5)
    st_hybrid = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=1,
        guidance_scale=3.5, mesh_axis="data", mesh=mesh)
    st_padded = pose2vid.Pose2VideoStatic(
        cfg=cfg, num_frames=F, height=H, width=W, num_inference_steps=1,
        guidance_scale=3.5, mesh_axis="data", pad_windows_to=ndev)

    wins, wts = pose2vid.make_windows(st_hybrid)
    assert wins.shape == (13, 8), wins.shape        # truly ragged, no pad
    assert (wts == 1.0).all()
    wins_p, wts_p = pose2vid.make_windows(st_padded)
    assert wins_p.shape == (16, 8) and (wts_p == 0).sum() == 3
    assert pose2vid._effective_chunk(st_hybrid, 13) == 12  # 12 DP + 1 tail

    # (a) equivalence with the unsharded single-device result
    baseline = np.asarray(pose2vid.generate_fn(params, st_plain, *inputs))
    repl = NamedSharding(mesh, P())
    params_r = jax.device_put(params, repl)
    inputs_r = jax.device_put(inputs, repl)
    with jax.set_mesh(mesh):
        hybrid = np.asarray(jax.jit(
            lambda p, a, b, c, d, e: pose2vid.generate_fn(
                p, st_hybrid, a, b, c, d, e)
        )(params_r, *inputs_r))
    np.testing.assert_allclose(baseline, hybrid, atol=2e-5)

    # (b) the padded windows really cost FLOPs and the hybrid doesn't:
    # per-device, padded runs 16/4 = 4 windows; hybrid runs 12/4 = 3
    # windows DP + 1 frame-sharded quarter ~= 3.3 -> expect < 0.9x
    # (cost_analysis() is per-device, post-SPMD-partitioning)
    ddim = DDIM.create(cfg.pipeline.scheduler, 1)
    lat = jnp.asarray(inputs[4])
    cond_fn = jax.jit(lambda p, a, b, c, d: pose2vid.prepare_conditioning(
        p, st_plain, a, b, c, d))
    cond = cond_fn(params, *inputs[:4])

    def step_flops(st, wins, wts):
        fn = functools.partial(pose2vid.denoise_one_step, st=st, ddim=ddim,
                               windows=wins, window_weights=wts)
        with jax.set_mesh(mesh):
            lowered = jax.jit(
                lambda p, c, l: fn(params={"denoising_unet": p}, cond=c,
                                   latents=l, step_idx=jnp.asarray(0))
            ).lower(jax.device_put(params["denoising_unet"], repl),
                    jax.device_put(cond, repl), jax.device_put(lat, repl))
            return lowered.compile().cost_analysis()["flops"]

    f_hybrid = step_flops(st_hybrid, wins, wts)
    f_padded = step_flops(st_padded, wins_p, wts_p)
    assert f_hybrid < 0.9 * f_padded, (f_hybrid, f_padded)


def test_reshard_branch_production_shapes():
    """The frame-parallel temporal attention must take the all-to-all
    branch (not the all-gather fallback) at every UNet level of the
    production 512x784 clip, for any mesh width up to 8 (VERDICT r3 weak
    #6: pin branch selection explicitly). Levels: latent (64, 98), then
    ceil-halved by the stride-2/pad-1 downsample convs."""
    h, w = 512 // 8, 784 // 8              # VAE downscale 8 -> (64, 98)
    levels = []
    for _ in range(4):                      # 4 block levels + mid at the last
        levels.append(h * w)
        h, w = -(-h // 2), -(-w // 2)
    assert levels[:2] == [6272, 1568]      # the flash-profiled shapes
    for spatial in levels:
        for ndev in (2, 4, 8):
            assert U.reshard_mode(spatial, ndev) == "a2a", (spatial, ndev)
    # the fallback exists and triggers only on ragged S (tiny test shapes)
    assert U.reshard_mode(9, 2) == "gather"
