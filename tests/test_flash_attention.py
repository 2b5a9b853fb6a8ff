"""Flash-attention kernel parity vs the reference jnp attention.

Runs the Pallas kernel in interpreter mode on CPU (compiled-mode execution
is exercised on the real chip by bench/integration runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handwritten_ocr_tpu.models.layers import attention, causal_mask
from handwritten_ocr_tpu.ops.flash_attention import flash_attention


def make_qkv(b, t, s, hq, hkv, d, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, t, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference_aligned(causal):
    q, k, v = make_qkv(2, 256, 256, 4, 2, 64)
    mask = causal_mask(256, 256) if causal else None
    expected = attention(q, k, v, mask, scale=64 ** -0.5)
    got = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_flash_ragged_kv_padding():
    # S=200 is not a block multiple: kernel pads to 256 and masks the tail.
    q, k, v = make_qkv(1, 200, 200, 2, 2, 32, seed=1)
    expected = attention(q, k, v, None, scale=32 ** -0.5)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_flash_causal_ragged():
    q, k, v = make_qkv(1, 130, 130, 2, 1, 32, seed=2)
    expected = attention(q, k, v, causal_mask(130, 130), scale=32 ** -0.5)
    got = flash_attention(q, k, v, causal=True, block_q=64, block_k=64,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_flash_gqa_grouping():
    # 8 q heads over 2 kv heads: grouping must map head h -> kv h//4.
    q, k, v = make_qkv(1, 64, 64, 8, 2, 32, seed=3)
    expected = attention(q, k, v, None, scale=32 ** -0.5)
    got = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16_io():
    q, k, v = make_qkv(1, 128, 128, 2, 2, 64, seed=4)
    q16, k16, v16 = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = flash_attention(q16, k16, v16, interpret=True)
    assert got.dtype == jnp.bfloat16
    expected = attention(q16, k16, v16, None, scale=64 ** -0.5)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(expected, dtype=np.float32),
                               rtol=2e-2, atol=2e-2)


def test_bf16_rope_fast_path_close_to_fp32(monkeypatch):
    """bf16-compute rope stays within bf16 rounding of the fp32 path."""
    import jax.numpy as jnp
    from handwritten_ocr_tpu.models.layers import apply_rope
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 16, 4, 32)).astype(np.float32))
    cos = jnp.asarray(np.cos(rng.standard_normal((16, 1, 32))).astype(np.float32))
    sin = jnp.asarray(np.sin(rng.standard_normal((16, 1, 32))).astype(np.float32))

    q16 = q.astype(jnp.bfloat16)
    fast_q, _ = apply_rope(q16, q16, cos, sin)
    monkeypatch.setenv("HOCR_TPU_ROPE_FP32", "1")
    exact_q, _ = apply_rope(q16, q16, cos, sin)
    diff = np.abs(np.asarray(fast_q, np.float32) - np.asarray(exact_q, np.float32))
    assert diff.max() <= 0.05  # a few bf16 ulps at |x|~2

    # fp32 inputs are bit-identical regardless of the flag.
    monkeypatch.delenv("HOCR_TPU_ROPE_FP32")
    a32, _ = apply_rope(q, q, cos, sin)
    monkeypatch.setenv("HOCR_TPU_ROPE_FP32", "1")
    b32, _ = apply_rope(q, q, cos, sin)
    np.testing.assert_array_equal(np.asarray(a32), np.asarray(b32))


def test_per_row_kv_mask():
    """2D kv_mask: each batch row masks its own keys (the window-folded
    vision path) — matches the masked jnp reference per row."""
    rng = np.random.default_rng(8)
    b, s, h, d = 3, 32, 2, 16
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    mask = np.ones((b, s), bool)
    mask[0, 20:] = False
    mask[2, 5:] = False
    got = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(mask), interpret=True))
    for row in range(b):
        scores = np.einsum("thd,shd->hts", q[row], k[row]) * d ** -0.5
        scores = np.where(mask[row][None, None], scores, -1e30)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p = np.where(mask[row][None, None], p, 0)
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("hts,shd->thd", p, v[row])
        np.testing.assert_allclose(got[row], want, atol=2e-2)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_match_reference(causal):
    """Training paths (train/step.py) differentiate through the kernel:
    the custom VJP's backward (rematerialized XLA attention) must equal
    the gradient of the jnp reference attention."""
    q, k, v = make_qkv(2, 64, 64, 4, 2, 32, seed=5)
    mask = np.ones(64, bool)
    mask[-5:] = False
    mask_j = jnp.asarray(mask)

    def loss_kernel(q, k, v):
        out = flash_attention(q, k, v, mask_j, causal=causal,
                              block_q=64, block_k=64, interpret=True)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        full = (causal_mask(64, 64) if causal
                else jnp.ones((1, 1, 64, 64), bool))
        m = full & mask_j[None, None, None, :]
        out = attention(q, k, v, m, scale=32 ** -0.5)
        return (out.astype(jnp.float32) ** 2).sum()

    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)
