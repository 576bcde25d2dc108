"""Fused GroupNorm(+SiLU) Pallas kernels.

The XLA lowering of GroupNorm costs ~180 ms/denoise-step in the UNet
(two convert_reduce passes for the statistics plus a normalize pass over
each ~190 MB activation → 3 HBM reads + 1 write per tensor). Two kernels
cut that:

- *resident*: the whole (S, C) slab of one batch row sits in VMEM;
  statistics are computed as matmuls against a one-hot group-assignment
  matrix (MXU) and normalization (+ optional SiLU) happens before the
  single store — 1 read + 1 write. Pallas double-buffers both the input
  and output block across the batch grid, so the slab budget is 4×slab
  (+ fp32 row tiles); slabs beyond that fall through to
- *two-phase*: grid (N, 2, S-blocks). Phase 0 streams row blocks and
  accumulates per-channel sum/sum² in a persistent scratch; phase 1
  revisits the same blocks and normalizes with coefficients computed once
  per row — 2 reads + 1 write, any size (also covers the full-resolution
  VAE decode GroupNorms).

Numerics: statistics and the affine are fp32, matching
torch.nn.GroupNorm / layers.group_norm(mode="fp32") (parity-tested in
tests/test_groupnorm_kernel.py). Falls back to the XLA implementation
(returns None) off-TPU or for channel counts not divisible by groups.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-core VMEM budget for kernel working sets (the pallas_call raises the
# Mosaic scoped-VMEM limit to 100 MB; 40 MB keeps headroom for pipelining —
# the UNet lvl0 slab (48, 6272, 320) is resident at 18.7 MB)
_VMEM_BUDGET = 40 * 1024 * 1024

_ROW_TILE = 1024


def _stats_coeffs(col_sum, col_sq, scale_ref, bias_ref, onehot, n_elems,
                  eps: float):
    """(1, C) channel sums -> (mul_c, add_c) fp32 normalization coefficients
    via per-group reduce/scatter matmuls on the MXU."""
    g_sum = jnp.dot(col_sum, onehot, preferred_element_type=jnp.float32)
    g_sq = jnp.dot(col_sq, onehot, preferred_element_type=jnp.float32)
    g_mean = g_sum / n_elems                          # (1, G)
    g_var = g_sq / n_elems - g_mean * g_mean
    g_inv = jax.lax.rsqrt(g_var + eps)
    mean_c = jnp.dot(g_mean, onehot.T,
                     preferred_element_type=jnp.float32)   # (1, C)
    mul_c = (jnp.dot(g_inv, onehot.T,
                     preferred_element_type=jnp.float32)
             * scale_ref[0].astype(jnp.float32))
    add_c = bias_ref[0].astype(jnp.float32) - mean_c * mul_c
    return mul_c, add_c


def _gn_kernel(x_ref, radd_ref, scale_ref, bias_ref, onehot_ref, out_ref,
               *, groups: int, eps: float, fuse_silu: bool):
    """Resident variant: one grid step per batch row, slab in VMEM.
    radd_ref (1, 1, C): per-row broadcast addend folded into the input (the
    resnet time-embedding add) — fused here instead of a standalone pass.
    (Kept 3-D so the per-row block equals the array's trailing dims — Mosaic
    requires block dims be (8,128)-divisible OR equal to the array's.)"""
    s, c = x_ref.shape[1], x_ref.shape[2]
    onehot = onehot_ref[:]                          # (C, G) fp32
    radd = radd_ref[0].astype(jnp.float32)          # (1, C)

    # pass 1: accumulate per-channel sum / sum-of-squares in row tiles so
    # the fp32 upcast never materializes the whole slab
    col_sum = jnp.zeros((1, c), jnp.float32)
    col_sq = jnp.zeros((1, c), jnp.float32)
    for lo in range(0, s, _ROW_TILE):
        hi = min(lo + _ROW_TILE, s)
        xa = x_ref[0, lo:hi, :].astype(jnp.float32) + radd
        col_sum = col_sum + jnp.sum(xa, axis=0, keepdims=True)
        col_sq = col_sq + jnp.sum(xa * xa, axis=0, keepdims=True)

    n = jnp.float32(s * (c // groups))
    mul_c, add_c = _stats_coeffs(col_sum, col_sq, scale_ref, bias_ref,
                                 onehot, n, eps)
    # fold the row addend into the affine offset: (x+r)*mul+add
    add_c = add_c + radd * mul_c

    # pass 2: normalize (+SiLU) tile-by-tile (VMEM-resident, no HBM reread)
    for lo in range(0, s, _ROW_TILE):
        hi = min(lo + _ROW_TILE, s)
        y = x_ref[0, lo:hi, :].astype(jnp.float32) * mul_c + add_c
        if fuse_silu:
            y = y * jax.nn.sigmoid(y)
        out_ref[0, lo:hi, :] = y.astype(out_ref.dtype)


def _gn2_kernel(x_ref, radd_ref, scale_ref, bias_ref, onehot_ref, out_ref,
                acc_ref, coef_ref, *, groups: int, eps: float,
                fuse_silu: bool, s_actual: int, block_s: int):
    """Two-phase variant. Grid (N, 2, nblk), k innermost:
    phase 0 accumulates channel sums over the row blocks of one batch row,
    phase 1 revisits the blocks and normalizes. acc/coef scratch persist
    across the grid; the output block index is (i, k*p) so nothing is
    flushed during phase 0."""
    p = pl.program_id(1)
    k = pl.program_id(2)
    c = x_ref.shape[2]

    @pl.when((p == 0) & (k == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(p == 0)
    def _accumulate():
        xa = (x_ref[0].astype(jnp.float32)
              + radd_ref[0].astype(jnp.float32))    # (block_s, C)
        if s_actual % block_s != 0:
            rows = jax.lax.broadcasted_iota(jnp.int32, xa.shape, 0)
            xa = jnp.where(rows + k * block_s < s_actual, xa, 0.0)
        acc_ref[0:1] += jnp.sum(xa, axis=0, keepdims=True)
        acc_ref[1:2] += jnp.sum(xa * xa, axis=0, keepdims=True)

    @pl.when((p == 1) & (k == 0))
    def _coefficients():
        n = jnp.float32(s_actual * (c // groups))
        mul_c, add_c = _stats_coeffs(acc_ref[0:1], acc_ref[1:2],
                                     scale_ref, bias_ref, onehot_ref[:],
                                     n, eps)
        coef_ref[0:1] = mul_c
        coef_ref[1:2] = add_c + radd_ref[0].astype(jnp.float32) * mul_c

    @pl.when(p == 1)
    def _normalize():
        y = x_ref[0].astype(jnp.float32) * coef_ref[0:1] + coef_ref[1:2]
        if fuse_silu:
            y = y * jax.nn.sigmoid(y)
        out_ref[0] = y.astype(out_ref.dtype)


def _gn_snc_kernel(x_ref, radd_ref, scale_ref, bias_ref, onehot_ref,
                   out_ref, acc_ref, coef_ref, *, groups: int, eps: float,
                   fuse_silu: bool, s_actual: int, block_s: int):
    """Transposed-layout two-phase variant: x is (S, N, C) — the logical
    transpose of (N, S, C) that matches XLA's conv-activation layout
    (physical minor-to-major C, N, S), so the operand/result reach the
    custom call as bitcasts instead of the ~1-2 ms relayout copies that
    bracket the (N, S, C) kernels inside the UNet resnets.

    Grid (2, nblk), k innermost: phase 0 streams (block_s, N, C) blocks and
    accumulates per-(N, C) sum/sum² in scratch; phase 1 revisits blocks and
    normalizes with per-(N, C) coefficients computed once. Blocks take the
    full (N, C) trailing extent (equal to the array dims — Mosaic-legal for
    any N/C), so stats for every batch row accumulate in one pass."""
    p = pl.program_id(0)
    k = pl.program_id(1)
    n, c = x_ref.shape[1], x_ref.shape[2]

    @pl.when((p == 0) & (k == 0))
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(p == 0)
    def _accumulate():
        xa = (x_ref[:].astype(jnp.float32)
              + radd_ref[:][None].astype(jnp.float32))  # (block_s, N, C)
        if s_actual % block_s != 0:
            rows = jax.lax.broadcasted_iota(jnp.int32, xa.shape, 0)
            xa = jnp.where(rows + k * block_s < s_actual, xa, 0.0)
        acc_ref[0] += jnp.sum(xa, axis=0)
        acc_ref[1] += jnp.sum(xa * xa, axis=0)

    @pl.when((p == 1) & (k == 0))
    def _coefficients():
        n_elems = jnp.float32(s_actual * (c // groups))
        radd = radd_ref[:].astype(jnp.float32)          # (N, C)
        mul_c, add_c = _stats_coeffs(acc_ref[0], acc_ref[1],
                                     scale_ref, bias_ref, onehot_ref[:],
                                     n_elems, eps)
        coef_ref[0] = mul_c
        coef_ref[1] = add_c + radd * mul_c

    @pl.when(p == 1)
    def _normalize():
        y = (x_ref[:].astype(jnp.float32) * coef_ref[0][None]
             + coef_ref[1][None])
        if fuse_silu:
            y = y * jax.nn.sigmoid(y)
        out_ref[:] = y.astype(out_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("groups", "eps", "fuse_silu"))
def _gn_pallas_snc(x_t: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   groups: int, eps: float, fuse_silu: bool,
                   row_add=None) -> jnp.ndarray:
    """x_t: (S, N, C) -> same (see _gn_snc_kernel). row_add: (N, C) or
    None."""
    s, n, c = x_t.shape
    if row_add is None:
        row_add = jnp.zeros((n, c), x_t.dtype)
    else:
        row_add = row_add.reshape(n, c)
    onehot = jnp.zeros((c, groups), jnp.float32).at[
        jnp.arange(c), jnp.arange(c) // (c // groups)].set(1.0)
    scale = scale.reshape(1, c)
    bias = bias.reshape(1, c)
    # 6 resident buffers (in/out double-buffered + fp32 temps); prefer a
    # dividing multiple-of-8 block (no ragged edge, aligned DMA rows)
    per_row = n * c * (x_t.dtype.itemsize * 4 + 8)
    cap = max(1, min(s, _VMEM_BUDGET // per_row))
    block_s = max((b for b in range(8, cap + 1, 8) if s % b == 0),
                  default=cap)
    nblk = -(-s // block_s)
    kernel = functools.partial(_gn_snc_kernel, groups=groups, eps=eps,
                               fuse_silu=fuse_silu, s_actual=s,
                               block_s=block_s)
    return pl.pallas_call(
        kernel,
        grid=(2, nblk),
        in_specs=[
            pl.BlockSpec((block_s, n, c), lambda p, k: (k, 0, 0)),
            pl.BlockSpec((n, c), lambda p, k: (0, 0)),
            pl.BlockSpec((1, c), lambda p, k: (0, 0)),
            pl.BlockSpec((1, c), lambda p, k: (0, 0)),
            pl.BlockSpec((c, groups), lambda p, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_s, n, c), lambda p, k: (k * p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x_t.shape, x_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, n, c), jnp.float32),
            pltpu.VMEM((2, n, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x_t, row_add, scale, bias, onehot)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "fuse_silu",
                                              "force_two_phase"))
def _gn_pallas(x2d: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               groups: int, eps: float, fuse_silu: bool,
               force_two_phase: bool = False,
               row_add=None) -> jnp.ndarray:
    """x2d: (N, S, C) -> same. row_add (N, C), optional: per-batch-row
    broadcast addend fused into the input (GN(x + row_add[:, None]))."""
    n, s, c = x2d.shape
    # (N, 1, C): the per-row (1, 1, C) block then equals the array's trailing
    # dims, which Mosaic accepts for any N (a (1, C) block of (N, C) is
    # rejected when N > 1: leading block dim 1 is not 8-divisible)
    if row_add is None:
        row_add = jnp.zeros((n, 1, c), x2d.dtype)
    else:
        row_add = row_add.reshape(n, 1, c)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * 1,
        vmem_limit_bytes=100 * 1024 * 1024)
    params2 = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * 3,
        vmem_limit_bytes=100 * 1024 * 1024)
    onehot = jnp.zeros((c, groups), jnp.float32).at[
        jnp.arange(c), jnp.arange(c) // (c // groups)].set(1.0)
    scale = scale.reshape(1, c)
    bias = bias.reshape(1, c)

    slab = s * c * x2d.dtype.itemsize
    tile = min(s, _ROW_TILE) * c * 4
    if not force_two_phase and 4 * slab + 2 * tile <= _VMEM_BUDGET:
        kernel = functools.partial(_gn_kernel, groups=groups, eps=eps,
                                   fuse_silu=fuse_silu)
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((c, groups), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
            compiler_params=params,
        )(x2d, row_add, scale, bias, onehot)

    # two-phase: pick a row block so 4 block buffers + fp32 temps fit
    block_s = max(8, min(_ceil_to(s, 8),
                         (_VMEM_BUDGET // 16) // (c * x2d.dtype.itemsize)
                         // 8 * 8))
    nblk = -(-s // block_s)
    kernel = functools.partial(_gn2_kernel, groups=groups, eps=eps,
                               fuse_silu=fuse_silu, s_actual=s,
                               block_s=block_s)
    return pl.pallas_call(
        kernel,
        grid=(n, 2, nblk),
        in_specs=[
            pl.BlockSpec((1, block_s, c), lambda i, p, k: (i, k, 0)),
            pl.BlockSpec((1, 1, c), lambda i, p, k: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, p, k: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, k: (0, 0)),
            pl.BlockSpec((c, groups), lambda i, p, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, c), lambda i, p, k: (i, k * p, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, c), jnp.float32),
            pltpu.VMEM((2, c), jnp.float32),
        ],
        compiler_params=params2,
    )(x2d, row_add, scale, bias, onehot)


def group_norm_fused(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     groups: int, eps: float,
                     fuse_silu: bool = False,
                     row_add: Optional[jnp.ndarray] = None,
                     snc: bool = False) -> Optional[jnp.ndarray]:
    """Fused GN(+SiLU) over an (N, ..., C) tensor, optionally of
    x + row_add[:, None, ..., :] (the resnet time-embedding add fused into
    the same pass). Returns None when the kernel doesn't apply (caller
    falls back to XLA).

    snc=True runs the (S, N, C) transposed-layout kernel: the logical
    transposes on entry/exit are bitcasts when the producer/consumer keep
    XLA's conv-activation layout (minor-to-major C, N, W, H), which is the
    case for every GN inside the UNet resnet/transformer blocks — use it
    for conv-adjacent sites, and the default row-major kernel for
    matmul-adjacent ones (e.g. the VAE mid-block attention)."""
    if jax.default_backend() != "tpu":
        return None
    n = x.shape[0]
    c = x.shape[-1]
    if c % groups or c < groups:
        return None
    s = x.size // (n * c)
    if s < 8:
        return None
    if snc:
        x_t = jnp.transpose(x.reshape(n, s, c), (1, 0, 2))
        y = _gn_pallas_snc(x_t, scale, bias, groups, eps, fuse_silu,
                           row_add=row_add)
        return jnp.transpose(y, (1, 0, 2)).reshape(x.shape)
    y = _gn_pallas(x.reshape(n, s, c), scale, bias, groups, eps, fuse_silu,
                   row_add=row_add)
    return y.reshape(x.shape)
