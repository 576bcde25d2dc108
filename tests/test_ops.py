"""ops/attention dispatch tests (XLA path on CPU; flash path is exercised on
real TPU by bench.py and was validated during bring-up: max |Δ| ≈ 1e-3 bf16
vs the XLA path at seq 1568/pad 1664)."""

import numpy as np
import jax
import jax.numpy as jnp

from mimo_tpu.ops import attention as A


def test_pick_block():
    assert A._pick_block(6272) == 896    # 6272 = 7 * 896
    assert A._pick_block(1664) == 128    # 13 * 128, 13 prime
    assert A._pick_block(12544) == 896
    assert A._pick_block(128) == 128
    assert A._pick_block(2048) == 1024
    # query blocks stay small (measured 10x difference, see attention.py)
    assert A._pick_block_q(6272) == 224
    assert A._pick_block_q(12544) == 256
    assert A._pick_block_k(12544) == 1792  # cap raised after measurement


def test_dispatch_small_matches_manual():
    rng = np.random.default_rng(0)
    b, sq, sk, heads, d = 2, 16, 24, 4, 8
    q = rng.standard_normal((b, sq, heads * d)).astype(np.float32)
    k = rng.standard_normal((b, sk, heads * d)).astype(np.float32)
    v = rng.standard_normal((b, sk, heads * d)).astype(np.float32)
    got = np.asarray(A.dispatch_sdpa(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), heads))
    qh = q.reshape(b, sq, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
    logits = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(d)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = (w @ vh).transpose(0, 2, 1, 3).reshape(b, sq, heads * d)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_not_used_on_cpu():
    assert not A._flash_available()


def _sdpa_oracle(q, k, v, heads):
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads
    qh = q.reshape(b, sq, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
    logits = (qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(d)).astype(np.float32)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return (w @ vh).transpose(0, 2, 1, 3).reshape(b, sq, inner)


def test_flash_nt_kernel_matches_oracle_interpret():
    """Natural-layout transposed-compute kernel numerics (interpret mode),
    including ragged Sq (edge q blocks) and ragged Sk (in-kernel key
    masking + value zeroing)."""
    from jax.experimental.pallas import tpu as pltpu
    from mimo_tpu.ops.flash_transposed import flash_sdpa_t

    rng = np.random.default_rng(1)
    for (b, sq, sk, heads, d, bq, bk) in [
        (2, 40, 72, 2, 8, 16, 32),     # ragged both: 40 = 2.5*16, 72 = 2.25*32
        (1, 64, 64, 4, 8, 32, 64),     # exact blocks
        (1, 24, 128, 1, 16, 24, 128),  # single blocks
    ]:
        q = rng.standard_normal((b, sq, heads * d)).astype(np.float32)
        k = rng.standard_normal((b, sk, heads * d)).astype(np.float32)
        v = rng.standard_normal((b, sk, heads * d)).astype(np.float32)
        want = _sdpa_oracle(q, k, v, heads)
        for gs in (False, True):       # per-block vs global softmax shift
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(flash_sdpa_t(jnp.asarray(q), jnp.asarray(k),
                                              jnp.asarray(v), heads,
                                              block_q=bq, block_k=bk,
                                              global_shift=gs))
            np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_nt_bank_kernel_matches_oracle_interpret():
    """Two-segment (self ‖ batch-shared bank) kernel == oracle on the
    explicit concat, including ragged self and bank segments."""
    import math
    from jax.experimental.pallas import tpu as pltpu
    from mimo_tpu.ops.flash_transposed import flash_attention_nt_bank

    rng = np.random.default_rng(2)
    for (b, sq, sk1, sk2, heads, d, bq, bk) in [
        (2, 40, 72, 40, 2, 8, 16, 32),   # both segments ragged
        (1, 64, 64, 64, 4, 8, 32, 64),   # exact blocks
        (2, 32, 32, 96, 2, 8, 16, 32),   # bank longer than self
    ]:
        q = rng.standard_normal((b, sq, heads * d)).astype(np.float32)
        k = rng.standard_normal((b, sk1, heads * d)).astype(np.float32)
        v = rng.standard_normal((b, sk1, heads * d)).astype(np.float32)
        kb = rng.standard_normal((1, sk2, heads * d)).astype(np.float32)
        vb = rng.standard_normal((1, sk2, heads * d)).astype(np.float32)
        kcat = np.concatenate([k, np.broadcast_to(kb, (b,) + kb.shape[1:])], 1)
        vcat = np.concatenate([v, np.broadcast_to(vb, (b,) + vb.shape[1:])], 1)
        want = _sdpa_oracle(q, kcat, vcat, heads)
        for gs in (False, True):       # per-block vs global softmax shift
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(flash_attention_nt_bank(
                    jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                    jnp.asarray(kb), jnp.asarray(vb), heads,
                    sm_scale=1.0 / math.sqrt(d), block_q=bq, block_k=bk,
                    global_shift=gs))
            np.testing.assert_allclose(got, want, atol=2e-5)


def test_flash_nt_kernel_bf16_precision_pinned():
    """The shipped production path runs in bf16, where the kernel computes
    exp2 on a bf16-rounded exponent (flash_transposed.py) — a deliberate
    precision tradeoff that the fp32 interpret tests never exercised
    (ADVICE round 2). Pin it: bf16 kernel output vs the fp32 numpy oracle
    must stay within a few bf16 ulps of the oracle's own bf16 rounding."""
    from jax.experimental.pallas import tpu as pltpu
    from mimo_tpu.ops.flash_transposed import flash_sdpa_t

    rng = np.random.default_rng(3)
    b, sq, sk, heads, d = 2, 48, 96, 2, 8
    q = rng.standard_normal((b, sq, heads * d)).astype(np.float32)
    k = rng.standard_normal((b, sk, heads * d)).astype(np.float32)
    # spread the value magnitudes so suppressed attention weights matter
    v = (rng.standard_normal((b, sk, heads * d)) * 4).astype(np.float32)
    qb = jnp.asarray(q, jnp.bfloat16)
    kb_ = jnp.asarray(k, jnp.bfloat16)
    vb_ = jnp.asarray(v, jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_sdpa_t(qb, kb_, vb_, heads,
                                      block_q=16, block_k=32)
                         .astype(jnp.float32))
    # oracle on the bf16-rounded inputs (matching what the kernel reads)
    want = _sdpa_oracle(np.asarray(qb.astype(jnp.float32)),
                        np.asarray(kb_.astype(jnp.float32)),
                        np.asarray(vb_.astype(jnp.float32)), heads)
    # bf16 has ~2-3 decimal digits; the exp2-on-bf16 exponent adds up to
    # ~2% relative error on suppressed weights. |v| <= ~16 here, so an
    # absolute envelope of 0.25 (~3 bf16 ulps at this magnitude) pins the
    # tradeoff without flaking.
    np.testing.assert_allclose(got, want, atol=0.25)


def test_deform_conv2d_window_matches_gather():
    """The static-window deform kernel (bounded offsets) must reproduce
    the gather-based deform_conv2d exactly (fp reassociation only)."""
    from mimo_tpu.ops.sampling import deform_conv2d, deform_conv2d_window

    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout, G = 2, 9, 11, 8, 6, 2
    kh = kw = 3
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(kh, kw, Cin, Cout)) * 0.2,
                         jnp.float32)
    bias = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
    # bounded offsets, incl. fractional + exactly-integer + out-of-image
    off = jnp.asarray(rng.uniform(-3.0, 3.0, (B, H, W, G * kh * kw * 2)),
                      jnp.float32)
    off = off.at[0, 0, 0, 0].set(2.0)         # exact integer corner case
    mask = jnp.asarray(rng.uniform(0, 1, (B, H, W, G * kh * kw)),
                       jnp.float32)

    want = deform_conv2d(x, off, kernel, bias, mask=mask, kh=kh, kw=kw,
                         deform_groups=G)
    got = deform_conv2d_window(x, off, kernel, bias, mask=mask, kh=kh,
                               kw=kw, deform_groups=G, max_abs_offset=3.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
