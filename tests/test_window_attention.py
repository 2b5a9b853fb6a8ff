"""Parity tests for the fused multi-window vision attention kernel.

The Pallas kernel (ops/window_attention.py, run here through the
interpreter on CPU) must match the batched-einsum reference path of
models/qwen25vl/vision._attend_windows — including rope application,
dead-slot key masking, ragged edge windows, and multi-chunk grids.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_ocr_tpu.models.layers import apply_rope
from handwritten_ocr_tpu.models.qwen25vl.config import VisionConfig
from handwritten_ocr_tpu.models.qwen25vl.vision import (_attend_windows,
                                                        plan_grid)
from handwritten_ocr_tpu.ops.window_attention import (_chunk_windows,
                                                      window_attention)


def _ref_window_attention(qkv, cos, sin, valid, num_heads, window_len, scale):
    """jnp reference: per-window attention on the packed qkv tensor."""
    b, p, three_d = qkv.shape
    d = three_d // 3
    n_win = p // window_len
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return x.reshape(b, n_win, window_len, num_heads, d // num_heads)

    q, k, v = heads(q), heads(k), heads(v)
    cos_w = cos.reshape(n_win, window_len, -1)[None, :, :, None, :]
    sin_w = sin.reshape(n_win, window_len, -1)[None, :, :, None, :]
    q, k = apply_rope(q, k, cos_w.astype(q.dtype), sin_w.astype(q.dtype))
    scores = jnp.einsum("bwthd,bwshd->bwhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = valid.reshape(n_win, window_len)[None, :, None, None, :]
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bwhts,bwshd->bwthd", weights, v)
    return out.reshape(b, p, d)


def test_chunk_windows_byte_budget():
    """Chunk choice is BYTE-aware: the same grid must shrink its chunk
    when the dtype widens (the round-3 bench OOM was a rows-only cap
    tuned at bf16 compiling f32 blocks at 2x the budget)."""
    # Flagship bench grid: n_win=54, window_len=64, D=1280, hd=80.
    assert _chunk_windows(54, 64, 1280, 80, 2, True) == 6    # 384 rows
    assert _chunk_windows(54, 64, 1280, 80, 4, True) == 3    # f32: half
    assert _chunk_windows(54, 64, 1280, 80, 2, False) == 9   # fold: 576
    bf16 = _chunk_windows(54, 64, 1280, 80, 2, True)
    f32 = _chunk_windows(54, 64, 1280, 80, 4, True)
    assert f32 < bf16
    assert _chunk_windows(1, 64, 1280, 80, 4, True) == 1     # floor: 1 win


@pytest.mark.parametrize("packed", [False, True])
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 3e-2)])
@pytest.mark.parametrize("n_win,window_len", [(6, 16), (10, 128)])
def test_kernel_matches_reference(dtype, tol, n_win, window_len, packed):
    num_heads, hd, b = 4, 16, 2
    d = num_heads * hd
    p = n_win * window_len
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    qkv = jax.random.normal(ks[0], (b, p, 3 * d), dtype)
    cos = jnp.cos(jax.random.normal(ks[1], (p, hd), jnp.float32))
    sin = jnp.sin(jax.random.normal(ks[2], (p, hd), jnp.float32))
    # Ragged validity: kill a tail of keys in some windows + one lone slot.
    valid = np.ones(p, bool)
    valid[window_len - 3:window_len] = False
    valid[2 * window_len + 1:3 * window_len] = False
    valid = jnp.asarray(valid)

    got = window_attention(qkv, cos, sin, valid, num_heads=num_heads,
                           window_len=window_len, scale=hd ** -0.5,
                           interpret=True, packed=packed)
    want = _ref_window_attention(qkv, cos, sin, valid, num_heads,
                                 window_len, hd ** -0.5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:, np.asarray(valid)],
        np.asarray(want, np.float32)[:, np.asarray(valid)],
        rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5),
                                       (jnp.bfloat16, 3e-2)])
def test_attend_windows_kernel_vs_einsum(monkeypatch, dtype, tol):
    """Full _attend_windows on a real ragged GridPlan, both dispatch modes."""
    cfg = VisionConfig(depth=2, hidden_size=32, intermediate_size=64,
                       num_heads=4, patch_size=2, window_size=8,
                       fullatt_block_indexes=(1,), out_hidden_size=16)
    plan = plan_grid(cfg, (1, 6, 10))                  # ragged edge windows
    p, d = plan.n_windows * plan.window_len, cfg.hidden_size
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    params = {
        "qkv": {"w": jax.random.normal(ks[0], (d, 3 * d), dtype) * 0.2,
                "b": jax.random.normal(ks[1], (3 * d,), dtype) * 0.1},
        "proj": {"w": jax.random.normal(ks[2], (d, d), dtype) * 0.2,
                 "b": jax.random.normal(ks[3], (d,), dtype) * 0.1},
    }
    valid = jnp.asarray(plan.valid)
    x = jax.random.normal(ks[4], (2, p, d), dtype)
    x = x * valid[:, None].astype(dtype)
    win_valid = valid.reshape(plan.n_windows, plan.window_len)
    cos_w = jnp.asarray(plan.cos_pad).reshape(plan.n_windows,
                                              plan.window_len, -1)
    sin_w = jnp.asarray(plan.sin_pad).reshape(plan.n_windows,
                                              plan.window_len, -1)

    monkeypatch.setenv("HOCR_TPU_WINATTN", "interpret")
    got = _attend_windows(params, cfg, x, cos_w, sin_w, win_valid)
    monkeypatch.setenv("HOCR_TPU_WINATTN", "0")
    want = _attend_windows(params, cfg, x, cos_w, sin_w, win_valid)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[:, np.asarray(valid)],
        np.asarray(want, np.float32)[:, np.asarray(valid)],
        rtol=tol, atol=tol)


@pytest.mark.parametrize("packed", [False, True])
def test_window_gradients_match_reference(packed):
    """The vision tower's 28 window layers sit on the train path
    (train/step.py -> vision_encode); the kernel's custom-VJP backward
    must equal the gradient of the einsum reference."""
    num_heads, window_len, n_win = 4, 16, 4
    hd = 32
    d = num_heads * hd
    p = n_win * window_len
    key = jax.random.PRNGKey(7)
    qkv = jax.random.normal(key, (2, p, 3 * d), jnp.float32)
    cos = jnp.cos(jax.random.normal(jax.random.PRNGKey(8), (p, hd)))
    sin = jnp.sin(jax.random.normal(jax.random.PRNGKey(9), (p, hd)))
    valid = np.ones(p, bool)
    valid[-7:] = False
    valid = jnp.asarray(valid)

    def loss_kernel(x):
        out = window_attention(x, cos, sin, valid, num_heads=num_heads,
                               window_len=window_len, scale=hd ** -0.5,
                               interpret=True, packed=packed)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_ref(x):
        out = _ref_window_attention(x, cos, sin, valid, num_heads,
                                    window_len, hd ** -0.5)
        return (out.astype(jnp.float32) ** 2).sum()

    got = jax.grad(loss_kernel)(qkv)
    want = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
