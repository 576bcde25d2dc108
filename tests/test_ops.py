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
