"""RAFT optical flow, JAX/TPU.

Reference: video_decomp/ProPainter/RAFT/ (~980 LoC): `RAFT` (raft.py:24),
all-pairs correlation pyramid `CorrBlock` (corr.py:12, grid_sample-based
lookup), conv-GRU update block (update.py), feature/context encoders
(extractor.py). Wrapped bidirectionally by RAFT_bi
(ProPainter/model/modules/flow_comp_raft.py:27) to produce forward+backward
flows for ProPainter.

TPU-native notes: the iterative refinement is a `lax.scan`; the correlation
volume is one big einsum (MXU); pyramid lookups are gather-based bilinear
sampling (ops/sampling.py); frame pairs batch in the leading axis.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mimo_tpu.models import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 20
    # encoder channel plan (BasicEncoder): stem 64 -> (64, 96, 128) -> out
    enc_dims: Tuple[int, int, int] = (64, 96, 128)
    fmap_dim: int = 256


def tiny_raft_config() -> RAFTConfig:
    return RAFTConfig(hidden_dim=16, context_dim=16, corr_levels=2,
                      corr_radius=2, iters=3, enc_dims=(8, 12, 16),
                      fmap_dim=16)


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------


def _inorm_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _norm(p, x, kind):
    """Encoder normalization (extractor.py BasicEncoder norm_fn):

    - "instance": InstanceNorm2d affine=False, track_running_stats=False —
      per-sample per-channel stats; scale/bias are identity placeholders
      (fnet, raft.py:54 norm_fn='instance').
    - "affine": eval-mode BatchNorm2d with running stats folded by the
      converter into a fixed per-channel scale/bias — NO per-sample
      statistics (cnet, raft.py:55 norm_fn='batch').
    """
    if kind == "affine":
        return (x.astype(jnp.float32) * p["scale"] + p["bias"]).astype(x.dtype)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _resunit_init(key, c_in, c_out, stride):
    k = jax.random.split(key, 3)
    p = {
        "conv1": L.conv2d_init(k[0], 3, 3, c_in, c_out),
        "n1": _inorm_init(c_out),
        "conv2": L.conv2d_init(k[1], 3, 3, c_out, c_out),
        "n2": _inorm_init(c_out),
        "stride": stride,
    }
    if stride != 1 or c_in != c_out:
        p["down"] = L.conv2d_init(k[2], 1, 1, c_in, c_out)
        p["dn"] = _inorm_init(c_out)
    return p


def _resunit(p, x, kind, s: int):
    # stride is architectural (2 on each layer's first unit) and must stay
    # a Python int — p["stride"] (kept for checkpoint roundtrips) becomes
    # a tracer under the round-4 whole-program jit
    h = jax.nn.relu(_norm(p["n1"], L.conv2d(p["conv1"], x, stride=s,
                                            padding=1), kind))
    h = jax.nn.relu(_norm(p["n2"], L.conv2d(p["conv2"], h, padding=1), kind))
    if "down" in p:
        x = _norm(p["dn"], L.conv2d(p["down"], x, stride=s, padding=0), kind)
    return jax.nn.relu(x + h)


def _encoder_init(key, cfg: RAFTConfig, out_dim: int) -> Params:
    keys = iter(jax.random.split(key, 16))
    d1, d2, d3 = cfg.enc_dims
    return {
        "stem": L.conv2d_init(next(keys), 7, 7, 3, d1),
        "stem_n": _inorm_init(d1),
        "layer1": [_resunit_init(next(keys), d1, d1, 1),
                   _resunit_init(next(keys), d1, d1, 1)],
        "layer2": [_resunit_init(next(keys), d1, d2, 2),
                   _resunit_init(next(keys), d2, d2, 1)],
        "layer3": [_resunit_init(next(keys), d2, d3, 2),
                   _resunit_init(next(keys), d3, d3, 1)],
        "head": L.conv2d_init(next(keys), 1, 1, d3, out_dim),
    }


def _encoder(p, x, kind="instance"):
    h = jax.nn.relu(_norm(p["stem_n"], L.conv2d(p["stem"], x, stride=2,
                                                padding=3), kind))
    for layer, s0 in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        for i, blk in enumerate(p[layer]):
            h = _resunit(blk, h, kind, s0 if i == 0 else 1)
    return L.conv2d(p["head"], h, padding=0)


# ---------------------------------------------------------------------------
# update block
# ---------------------------------------------------------------------------


def _gru_init(key, hidden, in_dim):
    k = jax.random.split(key, 6)
    mk = lambda kk, kh, kw: L.conv2d_init(kk, kh, kw, hidden + in_dim, hidden)
    return {
        "z1": mk(k[0], 1, 5), "r1": mk(k[1], 1, 5), "q1": mk(k[2], 1, 5),
        "z2": mk(k[3], 5, 1), "r2": mk(k[4], 5, 1), "q2": mk(k[5], 5, 1),
    }


def _gru_pass(pz, pr, pq, h, x, pad):
    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(L.conv2d(pz, hx, padding=pad))
    r = jax.nn.sigmoid(L.conv2d(pr, hx, padding=pad))
    q = jnp.tanh(L.conv2d(pq, jnp.concatenate([r * h, x], axis=-1),
                          padding=pad))
    return (1 - z) * h + z * q


def _sep_gru(p, h, x):
    """SepConvGRU: horizontal (1x5) then vertical (5x1) pass."""
    h = _gru_pass(p["z1"], p["r1"], p["q1"], h, x, [(0, 0), (2, 2)])
    h = _gru_pass(p["z2"], p["r2"], p["q2"], h, x, [(2, 2), (0, 0)])
    return h


def _update_init(key, cfg: RAFTConfig) -> Params:
    keys = iter(jax.random.split(key, 16))
    corr_dim = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    hd = cfg.hidden_dim
    return {
        # motion encoder
        "mc1": L.conv2d_init(next(keys), 1, 1, corr_dim, 256),
        "mc2": L.conv2d_init(next(keys), 3, 3, 256, 192),
        "mf1": L.conv2d_init(next(keys), 7, 7, 2, 128),
        "mf2": L.conv2d_init(next(keys), 3, 3, 128, 64),
        "mout": L.conv2d_init(next(keys), 3, 3, 192 + 64, 128 - 2),
        "gru": _gru_init(next(keys), hd, 128 + cfg.context_dim),
        "fh1": L.conv2d_init(next(keys), 3, 3, hd, 256),
        "fh2": L.conv2d_init(next(keys), 3, 3, 256, 2),
        "up1": L.conv2d_init(next(keys), 3, 3, hd, 256),
        "up2": L.conv2d_init(next(keys), 1, 1, 256, 64 * 9),
    }


def _motion_encoder(p, flow, corr):
    c = jax.nn.relu(L.conv2d(p["mc1"], corr, padding=0))
    c = jax.nn.relu(L.conv2d(p["mc2"], c, padding=1))
    f = jax.nn.relu(L.conv2d(p["mf1"], flow, padding=3))
    f = jax.nn.relu(L.conv2d(p["mf2"], f, padding=1))
    out = jax.nn.relu(L.conv2d(p["mout"],
                               jnp.concatenate([c, f], axis=-1), padding=1))
    return jnp.concatenate([out, flow], axis=-1)       # 128 ch


# ---------------------------------------------------------------------------
# correlation pyramid
# ---------------------------------------------------------------------------


def _corr_pyramid(f1: jnp.ndarray, f2: jnp.ndarray, levels: int):
    """f1, f2: (B, H, W, D). Returns list of (B*H*W, hl, wl, 1) volumes."""
    B, H, W, D = f1.shape
    corr = jnp.einsum("bxyd,buvd->bxyuv", f1, f2) / jnp.sqrt(
        jnp.asarray(D, f1.dtype))
    vol = corr.reshape(B * H * W, H, W, 1)
    pyr = [vol]
    for _ in range(levels - 1):
        vol = jax.lax.reduce_window(
            vol, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        pyr.append(vol)
    return pyr


def _corr_lookup(pyr, coords: jnp.ndarray, radius: int):
    """coords: (B, H, W, 2) current correspondence. Returns
    (B, H, W, levels*(2r+1)^2).

    TPU-native formulation (round 5): the reference's grid_sample lookup
    (RAFT/corr.py:50-71) gathers 4 single-f32 corners per tap — on TPU
    XLA lowers that to scalar-gather fusion loops measured at ~1.08 s
    PER refinement iteration (43 of raft_bi's 45.6 s steady wall;
    tools/profile_raft.py xplane). Bilinear sampling is linear in the
    volume and the tap offsets are integers, so the whole (2r+1)^2
    window lookup is two SEPARABLE dense contractions per level:

        out[n, ky, kx] = sum_{py,px} My[n,ky,py] Mx[n,kx,px] vol[n,py,px]

    with My/Mx carrying the two bilinear corner weights per row (built
    by iota comparison — rows outside the volume match nothing, which
    IS grid_sample's padding_mode='zeros'). Numerics match the gather
    path to fp reassociation: floor(c+k) == floor(c)+k for integer k,
    so corner indices and weights are identical. The batched matmuls
    run on the MXU: ~8 GFLOP/iter replaces the gather fusions.
    """
    B, H, W, _ = coords.shape
    N = B * H * W
    r = radius
    s = 2 * r + 1
    flat = coords.reshape(N, 2).astype(jnp.float32)
    ks = jnp.arange(-r, r + 1, dtype=jnp.float32)

    def taps_matrix(cc, n_pix):
        """cc: (N,) tap-center coords along one axis -> (N, s, n_pix)
        bilinear weights for the s integer-offset taps."""
        f0 = jnp.floor(cc)
        frac = (cc - f0)[:, None, None]            # (N, 1, 1)
        base = f0[:, None] + ks[None]              # (N, s)
        pix = jnp.arange(n_pix, dtype=jnp.float32)[None, None]
        tt = base[..., None]                       # (N, s, 1)
        return ((pix == tt) * (1.0 - frac) + (pix == tt + 1.0) * frac)

    out = []
    for lvl, vol in enumerate(pyr):
        hl, wl = vol.shape[1], vol.shape[2]
        c = flat / (2.0 ** lvl)
        My = taps_matrix(c[:, 1], hl)              # (N, s, hl)
        Mx = taps_matrix(c[:, 0], wl)              # (N, s, wl)
        v = vol.reshape(N, hl, wl)
        tmp = jnp.einsum("nsh,nhw->nsw", My, v,
                         preferred_element_type=jnp.float32)
        res = jnp.einsum("nsw,ntw->nst", tmp, Mx,
                         preferred_element_type=jnp.float32)
        out.append(res.reshape(B, H, W, s * s))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def raft_init(key, cfg: RAFTConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fnet": _encoder_init(k1, cfg, cfg.fmap_dim),
        "cnet": _encoder_init(k2, cfg, cfg.hidden_dim + cfg.context_dim),
        "update": _update_init(k3, cfg),
    }


def _upsample_flow(flow: jnp.ndarray, up_mask: jnp.ndarray) -> jnp.ndarray:
    """Convex 8x upsampling (raft.py upsample_flow): per-pixel softmax over
    9 coarse neighbors for each of the 8x8 sub-pixels."""
    B, H, W, _ = flow.shape
    mask = up_mask.reshape(B, H, W, 8 * 8, 9)
    mask = jax.nn.softmax(mask.astype(jnp.float32), axis=-1)

    # 3x3 neighborhoods of the coarse flow
    fpad = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([
        fpad[:, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ], axis=-2)                                        # (B, H, W, 9, 2)
    up = jnp.einsum("bhwsn,bhwnc->bhwsc", mask,
                    neigh.astype(jnp.float32) * 8.0)   # (B, H, W, 64, 2)
    up = up.reshape(B, H, W, 8, 8, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(B, 8 * H, 8 * W, 2).astype(flow.dtype)


def raft_flow(p: Params, cfg: RAFTConfig, img1: jnp.ndarray,
              img2: jnp.ndarray) -> jnp.ndarray:
    """img1, img2: (B, H, W, 3) in [-1, 1], H/W multiples of 8.
    Returns flow (B, H, W, 2) in pixels."""
    B, H, W, _ = img1.shape
    f1 = _encoder(p["fnet"], img1, kind="instance")
    f2 = _encoder(p["fnet"], img2, kind="instance")
    cnet = _encoder(p["cnet"], img1, kind="affine")
    net = jnp.tanh(cnet[..., :cfg.hidden_dim])
    inp = jax.nn.relu(cnet[..., cfg.hidden_dim:])

    pyr = _corr_pyramid(f1.astype(jnp.float32), f2.astype(jnp.float32),
                        cfg.corr_levels)
    h8, w8 = H // 8, W // 8
    ys = jnp.arange(h8, dtype=jnp.float32)
    xs = jnp.arange(w8, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None],
                               (B, h8, w8, 2))

    def step(carry, _):
        net, coords = carry
        corr = _corr_lookup(pyr, coords, cfg.corr_radius)
        flow = coords - coords0
        motion = _motion_encoder(p["update"], flow.astype(net.dtype),
                                 corr.astype(net.dtype))
        x = jnp.concatenate([inp, motion], axis=-1)
        net2 = _sep_gru(p["update"]["gru"], net, x)
        dflow = L.conv2d(p["update"]["fh2"], jax.nn.relu(
            L.conv2d(p["update"]["fh1"], net2, padding=1)), padding=1)
        coords2 = coords + dflow.astype(jnp.float32)
        return (net2, coords2), None

    (net, coords), _ = jax.lax.scan(step, (net, coords0), None,
                                    length=cfg.iters)
    flow8 = coords - coords0
    up_mask = L.conv2d(p["update"]["up2"], jax.nn.relu(
        L.conv2d(p["update"]["up1"], net, padding=1)), padding=0)
    return _upsample_flow(flow8.astype(jnp.float32), up_mask)


@functools.partial(jax.jit, static_argnames=("cfg",))
def raft_bi(p: Params, cfg: RAFTConfig, frames: jnp.ndarray):
    """frames: (T, H, W, 3) in [-1, 1]. Returns (flow_fwd (T-1, H, W, 2),
    flow_bwd (T-1, H, W, 2)) — the RAFT_bi contract
    (flow_comp_raft.py:27).

    Jitted whole (round 4): the eager path paid ~35 ms axon dispatch per
    op (encoders + 20 scan iters of pyramid lookups); one cached program
    per clip shape instead."""
    a, b = frames[:-1], frames[1:]
    fwd = raft_flow(p, cfg, a, b)
    bwd = raft_flow(p, cfg, b, a)
    return fwd, bwd
