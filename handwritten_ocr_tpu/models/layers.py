"""Shared transformer building blocks (functional JAX).

Numerics match the HF reference implementations the checkpoints were trained
with (fp32 softmax and fp32 rotary application, RMSNorm in fp32 with cast
back), so greedy decode parity holds in bf16.

Parameter layout conventions (all linear weights stored as [in, out] so the
forward is ``x @ w`` — transposed from torch's [out, in] at load time):
  linear:  {"w": [in, out], optional "b": [out]}
  rmsnorm: {"scale": [dim]}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(params: dict, x: jax.Array, eps: float) -> jax.Array:
    """RMSNorm with fp32 statistics (HF Qwen2RMSNorm semantics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (params["scale"] * normed.astype(dtype)).astype(dtype)


def linear(params: dict, x: jax.Array) -> jax.Array:
    if "w_q" in params:  # weight-only int8 (models/quant.py)
        out = _quantized_matmul(params, x)
    else:
        out = x @ params["w"]
    if "b" in params:
        out = out + params["b"]
    return out


def _quantized_matmul(params: dict, x: jax.Array) -> jax.Array:
    """int8-weight matmul: Pallas kernel on the bandwidth-bound decode
    path (small leading dims), jnp dequant elsewhere (compute-bound)."""
    w_q, scale = params["w_q"], params["w_scale"]
    lead = 1
    for dim in x.shape[:-1]:
        lead *= dim

    from handwritten_ocr_tpu.ops.dispatch import (INT8_KERNEL_AUTO_BYTES,
                                                  int8_kernel_mode)
    mode = int8_kernel_mode()
    use_kernel = mode in ("compiled", "interpret") or (
        mode == "auto" and w_q.size >= INT8_KERNEL_AUTO_BYTES)
    if use_kernel and lead <= 32:
        from handwritten_ocr_tpu.ops.int8_matmul import (
            int8_matmul, int8_matmul_supported)
        if int8_matmul_supported(w_q.shape[0], w_q.shape[1]):
            flat = x.reshape(lead, x.shape[-1])
            out = int8_matmul(flat, w_q, scale,
                              interpret=(mode == "interpret"))
            return out.reshape(*x.shape[:-1], w_q.shape[1])
    return (x @ w_q.astype(x.dtype)) * scale.astype(x.dtype)


def swiglu_mlp(params: dict, x: jax.Array) -> jax.Array:
    """gate/up/down MLP with SiLU gate (Qwen2MLP / Qwen2_5_VLMLP)."""
    return linear(params["down"], jax.nn.silu(linear(params["gate"], x)) * linear(params["up"], x))


def gelu_mlp(params: dict, x: jax.Array) -> jax.Array:
    """fc1 → GELU → fc2 (vision patch merger MLP)."""
    return linear(params["fc2"], jax.nn.gelu(linear(params["fc1"], x), approximate=False))


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """Rotary application (HF apply_rotary_pos_emb semantics).

    q/k: [..., T, H, D]; cos/sin broadcastable to [..., T, 1, D].

    fp32 inputs always use fp32 math (bit-matching HF — the parity-test
    path). bf16 inputs compute in bf16 by default — ≤1 ulp(bf16) from the
    fp32-then-cast result, and ~20% faster on the vision tower (the fp32
    round-trips on unaligned 80-wide heads are relayout-bound); set
    ``HOCR_TPU_ROPE_FP32=1`` to force the exact HF arithmetic.
    """
    import os
    q_dtype, k_dtype = q.dtype, k.dtype
    fast = (q_dtype == jnp.bfloat16
            and not os.environ.get("HOCR_TPU_ROPE_FP32"))
    compute = q_dtype if fast else jnp.float32
    qf, kf = q.astype(compute), k.astype(compute)
    cosf, sinf = cos.astype(compute), sin.astype(compute)
    q_rot = qf * cosf + rotate_half(qf) * sinf
    k_rot = kf * cosf + rotate_half(kf) * sinf
    return q_rot.astype(q_dtype), k_rot.astype(k_dtype)


def rope_inv_freq(dim: int, theta: float) -> jax.Array:
    """Standard rotary inverse frequencies for ``dim`` (even)."""
    return 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None,
    scale: float,
) -> jax.Array:
    """Grouped-query attention with fp32 softmax.

    q: [B, T, Hq, D]; k/v: [B, S, Hkv, D]; Hq = Hkv * G.
    mask: bool [B, 1, T, S] (True = attend) or None for full attention.
    Returns [B, T, Hq, D].
    """
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    qg = q.reshape(b, t, hkv, groups, d)

    scores = jnp.einsum("btkgd,bskd->bkgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask[:, :, None, :, :] if mask.ndim == 4 else mask,
                           scores, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgts,bskd->btkgd", weights, v)
    return out.reshape(b, t, hq, d)


def causal_mask(t: int, s: int, offset: int = 0) -> jax.Array:
    """Bool [1, 1, t, s] causal mask; query i attends keys <= i + offset."""
    rows = jnp.arange(t)[:, None] + offset
    cols = jnp.arange(s)[None, :]
    return (cols <= rows)[None, None]
