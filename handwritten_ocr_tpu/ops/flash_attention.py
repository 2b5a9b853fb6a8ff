"""Flash attention for TPU (Pallas): fused online-softmax attention.

Replaces the O(S²)-memory jnp attention on the hot paths — decoder prefill
and the vision tower's global-attention layers. Standard flash algorithm:
the grid walks (batch·q_heads, q_blocks, kv_blocks) with the kv dimension
innermost; a VMEM accumulator carries the running max / normalizer / value
sum across kv blocks, so scores never materialize in HBM.

Supports GQA natively: kv arrives as [B·H_kv, S, D] and the index map
folds q-head → kv-head (no repeated-KV materialization → no wasted HBM
bandwidth). Causal masking and ragged kv lengths are handled with block
skipping + in-kernel iota masks.

Numerics: fp32 accumulation and softmax, matching models/layers.attention;
parity tested in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _flash_kernel(q_ref, k_ref, v_ref, kvm_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, scale: float, causal: bool, block_q: int, block_k: int,
                  kv_len: int, num_k_blocks: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q_start = qi * block_q
    k_start = ki * block_k

    def _step():
        # Dots keep the INPUT dtype with fp32 accumulation: bf16 operands
        # run the MXU at full rate (an fp32 upcast quarters it — measured
        # 31% vs 2.5 ms ideal on the vision global block) and match
        # models/layers.attention's einsum semantics; fp32 operands stay
        # bit-exact for the parity tests.
        q = q_ref[0]                                     # [BQ, D]
        k = k_ref[0]                                     # [BK, D]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQ, BK]

        col = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < kv_len
        mask = mask & (kvm_ref[0, 0] != 0)[None, :]       # per-key validity
        if causal:
            row = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        scores = jnp.where(mask, scores, _NEG_INF)

        m_prev = m_scratch[:]                             # [BQ, 1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # All-masked rows keep m = -inf; exp(-inf - -inf) guarded below.
        safe_m = jnp.where(m_new == _NEG_INF, 0.0, m_new)
        p = jnp.exp(scores - safe_m)
        p = jnp.where(mask, p, 0.0)
        correction = jnp.where(m_prev == _NEG_INF, 0.0,
                               jnp.exp(m_prev - safe_m))
        l_new = correction * l_scratch[:] + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0]                                      # [BK, D]
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scratch[:] = acc_scratch[:] * correction + pv
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    if causal:
        # Skip kv blocks strictly above the causal diagonal.
        pl.when(k_start <= q_start + block_q - 1)(_step)
    else:
        _step()

    @pl.when(ki == num_k_blocks - 1)
    def _finish():
        denom = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0] = (acc_scratch[:] / denom).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _auto_block(seq_len: int, cap: int = 512) -> int:
    """Block size: next multiple of 128 covering seq_len, capped.

    Large blocks win on the MXU (measured 2.9x at S≈5k going 128→512);
    short sequences shrink the block to avoid pure padding work.
    """
    return min(cap, max(128, -(-seq_len // 128) * 128))


def _reference_attention(q, k, v, kv_mask, causal: bool, scale: float):
    """Pure-XLA GQA attention mirroring the kernel's exact math (fp32
    softmax, guarded all-masked rows). Used as the BACKWARD of the
    custom-VJP wrapper: Pallas kernels have no autodiff rules, and the
    production train step (train/step.py) differentiates through the
    prefill attention — the gradient of online-softmax attention equals
    the gradient of this rematerialized form."""
    b, t, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    group = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, t, hkv, group, d)
    scores = jnp.einsum("bthgd,bshd->bhgts", qf,
                        k.astype(jnp.float32)) * scale
    mask = (kv_mask != 0).reshape(-1, 1, 1, 1, s)          # [1|B, ..., S]
    if causal:
        rows = jnp.arange(t)[:, None]
        cols = jnp.arange(s)[None, :]
        mask = mask & (cols <= rows)[None, None, None]     # kernel's raw iota
    scores = jnp.where(mask, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    safe_m = jnp.where(m == _NEG_INF, 0.0, m)
    p = jnp.where(mask, jnp.exp(scores - safe_m), 0.0)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    out = jnp.einsum("bhgts,bshd->bthgd", p / denom, v.astype(jnp.float32))
    return out.reshape(b, t, hq, d).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_diff(q, k, v, kv_mask, causal, scale, block_q, block_k,
                interpret):
    return _flash_forward(q, k, v, kv_mask, causal=causal, scale=scale,
                          block_q=block_q, block_k=block_k,
                          interpret=interpret)


def _flash_diff_fwd(q, k, v, kv_mask, causal, scale, block_q, block_k,
                    interpret):
    out = _flash_diff(q, k, v, kv_mask, causal, scale, block_q, block_k,
                      interpret)
    return out, (q, k, v, kv_mask)


def _flash_diff_bwd(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, kv_mask,
                                                causal, scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(kv_mask)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k", "interpret"))
def flash_attention(
    q: jax.Array,            # [B, T, Hq, D]
    k: jax.Array,            # [B, S, Hkv, D]
    v: jax.Array,            # [B, S, Hkv, D]
    kv_mask: jax.Array | None = None,   # [S] or [B, S] bool: masked keys
    *,
    causal: bool = False,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention; returns [B, T, Hq, D] in q's dtype.

    Differentiable: the forward runs the Pallas kernel; the backward
    (training paths) rematerializes the XLA reference attention.
    """
    t, s = q.shape[1], k.shape[1]
    d = q.shape[3]
    if scale is None:
        scale = d ** -0.5
    if block_q is None:
        block_q = _auto_block(t)
    if block_k is None:
        block_k = _auto_block(s)
    if kv_mask is None:
        kv_mask = jnp.ones((1, s), jnp.float32)
    elif kv_mask.ndim == 1:
        kv_mask = kv_mask.astype(jnp.float32)[None]        # shared mask
    else:
        kv_mask = kv_mask.astype(jnp.float32)              # [B, S] per row
    return _flash_diff(q, k, v, kv_mask, causal, scale, block_q, block_k,
                       interpret)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_mask: jax.Array,      # [1|B, S] float32 (normalized by the wrapper)
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    b, t, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    group = hq // hkv

    # Layout: fold batch and heads; pad sequence dims to block multiples.
    qf = _pad_to(q.transpose(0, 2, 1, 3).reshape(b * hq, t, d), 1, block_q)
    kf = _pad_to(k.transpose(0, 2, 1, 3).reshape(b * hkv, s, d), 1, block_k)
    vf = _pad_to(v.transpose(0, 2, 1, 3).reshape(b * hkv, s, d), 1, block_k)
    # Mask rides as [rows, 1, s_pad] so its (1, 1, block_k) block keeps
    # the last-two-dims tiling rule whatever the row count is.
    mf = _pad_to(kv_mask, 1, block_k)[:, None, :]          # [1|B, 1, s_pad]
    mask_rows = mf.shape[0]
    t_pad, s_pad = qf.shape[1], kf.shape[1]
    num_q_blocks = t_pad // block_q
    num_k_blocks = s_pad // block_k

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=s, num_k_blocks=num_k_blocks)

    out = pl.pallas_call(
        kernel,
        grid=(b * hq, num_q_blocks, num_k_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki, grp=group: (bh // grp, ki, 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki, grp=group: (bh // grp, ki, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bh, qi, ki, h=hq, mr=mask_rows:
                         (0 if mr == 1 else bh // h, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * hq, t_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, mf)

    return out[:, :t].reshape(b, hq, t, d).transpose(0, 2, 1, 3)
