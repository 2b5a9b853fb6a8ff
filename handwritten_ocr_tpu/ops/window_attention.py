"""Fused multi-window attention for the ViT tower (Pallas, TPU).

The vision encoder's 28 window layers attend within uniform 64-token
windows (ref: HF Qwen2.5-VL window attention; vision.py maps the varlen
HF layout onto a padded [B, n_win, L, D] one).  The XLA einsum path
materializes the [B, n_win, H, L, L] fp32 scores in HBM — profiled at
3.1 ms/layer (1.5% MFU) on a 3456-token page batch, pure memory traffic.
Folding windows one-by-one into the flash kernel was measured *slower*
(thousands of tiny instances).

This kernel takes the middle road the profile points at: each grid step
processes a CHUNK of W whole windows for one (batch·head) row — a single
[W·L, W·L] block-diagonal attention computed entirely in VMEM:

  * applies rotary embedding in-kernel (saves the separate rope pass,
    ~0.9 ms/layer of HBM glue);
  * computes scores as ONE [W·L, hd] × [hd, W·L] MXU dot and masks the
    off-diagonal window blocks with an iota mask — wasted flops are
    ~W× a negligible base, far cheaper than W separate tiny matmuls;
  * softmax in fp32, weights cast back to the value dtype for the pv
    dot (full-rate MXU, fp32 accumulation — same numerics contract as
    models/layers.attention).

Data layout follows the flash kernel: heads fold into the leading grid
dim ([B·H, P, hd] — hd must be the FULL last dim per Mosaic's block
rules), so the only HBM traffic besides the fold/unfold transposes is
one qkv read and one output write.  W is the largest divisor of
n_windows with W·L ≤ 1024 rows, so every chunk is exact (no ragged
grid blocks) and fits VMEM comfortably.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = float("-inf")


# Target scoped-VMEM usage per grid step. The hardware limit is 16 MiB;
# the margin absorbs Mosaic's own scratch and model error in _chunk_bytes.
_VMEM_BUDGET_BYTES = 13 * 2**20


def _chunk_bytes(rows: int, d: int, hd: int, itemsize: int,
                 packed: bool) -> int:
    """Estimated scoped-VMEM bytes for one grid step: double-buffered
    HBM blocks plus fp32 score-sized temporaries.

    BYTE-based on purpose — round 3 capped chunk size in ROWS tuned at
    bf16, and the same row count in f32 doubled the block bytes and blew
    the 16 MiB scoped-VMEM limit on the bench grid. Coefficients are
    calibrated against on-chip compiles (v5e, D=1280/hd=80):
      packed bf16 @576 rows → 19.7 M observed vs 20.0 M modeled
      packed f32  @384 rows → 22.1 M observed vs 20.5 M modeled
    """
    lanes = max(hd, 128)                      # Mosaic pads the lane dim
    scores = 14 * rows * rows                 # ~3.5 fp32 [R, R] temporaries
    if packed:
        # qkv block [R, 3D] + out [R, D], double-buffered (8·R·D·isz),
        # per-head fp32 pv outputs concatenated (4·R·D), rope tables.
        io = 8 * rows * d * itemsize + 4 * rows * d \
            + 4 * rows * lanes * itemsize
    else:
        # q/k/v/out blocks double-buffered + rope tables, all [R, hd].
        io = 12 * rows * lanes * itemsize
    return scores + io


def _chunk_windows(n_win: int, window_len: int, d: int, hd: int,
                   itemsize: int, packed: bool) -> int:
    """Largest divisor of n_win whose chunk fits the VMEM byte budget."""
    best = 1
    for w in range(1, n_win + 1):
        if n_win % w == 0 and _chunk_bytes(w * window_len, d, hd, itemsize,
                                           packed) <= _VMEM_BUDGET_BYTES:
            best = w
    return best


def _window_reference(qkv, cos, sin, valid, num_heads: int,
                      window_len: int, scale: float):
    """Pure-XLA mirror of the kernel math (rope in compute dtype, fp32
    score/pv accumulation, key-masked dead slots). Used as the BACKWARD
    of the custom-VJP wrapper: Pallas kernels have no autodiff rules,
    and the production train step (train/step.py) differentiates through
    the vision tower's 28 window layers on TPU."""
    b, p_len, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return x.reshape(b, p_len, num_heads, hd)

    cos_b = cos.astype(qkv.dtype)[None, :, None, :]
    sin_b = sin.astype(qkv.dtype)[None, :, None, :]

    def rope(x):
        half = hd // 2
        rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * cos_b + rot * sin_b

    n_win = p_len // window_len
    qw = rope(heads(q)).reshape(b, n_win, window_len, num_heads, hd)
    kw = rope(heads(k)).reshape(b, n_win, window_len, num_heads, hd)
    vw = heads(v).reshape(b, n_win, window_len, num_heads, hd)
    scores = jnp.einsum("bwthd,bwshd->bwhts", qw, kw,
                        preferred_element_type=jnp.float32) * scale
    key_ok = (valid != 0).reshape(1, n_win, 1, 1, window_len)
    scores = jnp.where(key_ok, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(m == _NEG_INF, 0.0, m)                  # all-masked guard
    p = jnp.where(key_ok, jnp.exp(scores - m), 0.0)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    out = jnp.einsum("bwhts,bwshd->bwthd", (p / denom).astype(vw.dtype), vw,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, p_len, d).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _window_diff(qkv, cos, sin, valid, num_heads, window_len, scale,
                 interpret, packed):
    return _window_forward(qkv, cos, sin, valid, num_heads=num_heads,
                           window_len=window_len, scale=scale,
                           interpret=interpret, packed=packed)


def _window_diff_fwd(qkv, cos, sin, valid, num_heads, window_len, scale,
                     interpret, packed):
    out = _window_diff(qkv, cos, sin, valid, num_heads, window_len, scale,
                       interpret, packed)
    return out, (qkv, cos, sin, valid)


def _window_diff_bwd(num_heads, window_len, scale, interpret, packed,
                     res, g):
    """Backward = autodiff through the pure-XLA reference (full per-window
    fp32 score materialization). SCALE LIMIT, stated plainly: this is
    sized for the tiny trained-fidelity A/B it serves (train/step.py at
    toy widths) — at the flagship grid (54 windows x 64 tokens x 16
    heads) the materialized scores would be fine for memory but the
    recompute costs ~2x the forward; a flash-style backward kernel is
    the round-5+ item if flagship-scale training ever matters. The
    FORWARD production path is unaffected (inference uses the fused
    kernel; this VJP only fires under jax.grad)."""
    qkv, cos, sin, valid = res
    _, vjp = jax.vjp(
        lambda x: _window_reference(x, cos, sin, valid, num_heads,
                                    window_len, scale), qkv)
    (dqkv,) = vjp(g)
    return (dqkv, jnp.zeros_like(cos), jnp.zeros_like(sin),
            jnp.zeros_like(valid))


_window_diff.defvjp(_window_diff_fwd, _window_diff_bwd)


def _window_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, valid_ref, o_ref,
                   *, scale: float, window_len: int):
    rows = q_ref.shape[1]

    def rope(x):
        half = x.shape[-1] // 2
        rot = jnp.concatenate([-x[:, half:], x[:, :half]], axis=-1)
        return x * cos_ref[...] + rot * sin_ref[...]

    q = rope(q_ref[0])                                    # [R, hd]
    k = rope(k_ref[0])
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [R, R]

    row_w = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // window_len
    col_w = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // window_len
    key_ok = valid_ref[...].reshape(rows) != 0            # [R] (keys)
    mask = (row_w == col_w) & key_ok[None, :]
    scores = jnp.where(mask, scores, _NEG_INF)

    m = jnp.max(scores, axis=1, keepdims=True)
    m = jnp.where(m == _NEG_INF, 0.0, m)                  # all-masked row guard
    p = jnp.exp(scores - m)
    p = jnp.where(mask, p, 0.0)
    denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    p = (p / denom).astype(v_ref.dtype)
    out = jax.lax.dot_general(p, v_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _packed_kernel(qkv_ref, cos_ref, sin_ref, valid_ref, o_ref,
                   *, scale: float, window_len: int, num_heads: int):
    """All-heads variant: one full-width [R, 3D] block per grid step,
    heads sliced in-kernel (lane offsets) — trades Mosaic relayouts for
    the fold/unfold HBM transposes of the per-head layout."""
    rows = qkv_ref.shape[1]
    d = o_ref.shape[2]
    hd = d // num_heads

    row_w = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // window_len
    col_w = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // window_len
    key_ok = valid_ref[...].reshape(rows) != 0
    mask = (row_w == col_w) & key_ok[None, :]
    cos = cos_ref[...]
    sin = sin_ref[...]

    def rope(x):
        half = hd // 2
        rot = jnp.concatenate([-x[:, half:], x[:, :half]], axis=-1)
        return x * cos + rot * sin

    outs = []
    block = qkv_ref[0]                                    # [R, 3D]
    for h in range(num_heads):
        q = rope(block[:, h * hd:(h + 1) * hd])
        k = rope(block[:, d + h * hd:d + (h + 1) * hd])
        v = block[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask, scores, _NEG_INF)
        m = jnp.max(scores, axis=1, keepdims=True)
        m = jnp.where(m == _NEG_INF, 0.0, m)
        p = jnp.exp(scores - m)
        p = jnp.where(mask, p, 0.0)
        denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        p = (p / denom).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "window_len",
                                             "scale", "interpret", "packed"))
def window_attention(
    qkv: jax.Array,          # [B, P, 3·H·hd] packed qkv projection output
    cos: jax.Array,          # [P, hd] rotary table (padded window layout)
    sin: jax.Array,          # [P, hd]
    valid: jax.Array,        # [P] bool — real token (dead slots masked as keys)
    *,
    num_heads: int,
    window_len: int,
    scale: float,
    interpret: bool = False,
    packed: bool = False,
) -> jax.Array:
    """Block-diagonal window attention; returns [B, P, H·hd] in qkv dtype.

    Differentiable: the forward runs the Pallas kernel; the backward
    (training paths) rematerializes the XLA reference attention.
    """
    return _window_diff(qkv, cos.astype(jnp.float32),
                        sin.astype(jnp.float32),
                        valid.astype(jnp.float32),
                        num_heads, window_len, scale, interpret, packed)


def _window_forward(
    qkv: jax.Array,
    cos: jax.Array,          # [P, hd] float32 (normalized by the wrapper)
    sin: jax.Array,          # [P, hd] float32
    valid: jax.Array,        # [P] float32
    *,
    num_heads: int,
    window_len: int,
    scale: float,
    interpret: bool,
    packed: bool,
) -> jax.Array:
    b, p_len, three_d = qkv.shape
    d = three_d // 3
    hd = d // num_heads
    n_win = p_len // window_len
    w = _chunk_windows(n_win, window_len, d, hd, qkv.dtype.itemsize, packed)
    rows = w * window_len
    n_chunks = n_win // w

    if packed:
        kernel = functools.partial(_packed_kernel, scale=scale,
                                   window_len=window_len,
                                   num_heads=num_heads)
        return pl.pallas_call(
            kernel,
            grid=(b, n_chunks),
            in_specs=[
                pl.BlockSpec((1, rows, three_d), lambda bi, ci: (bi, ci, 0)),
                pl.BlockSpec((rows, hd), lambda bi, ci: (ci, 0)),
                pl.BlockSpec((rows, hd), lambda bi, ci: (ci, 0)),
                pl.BlockSpec((rows, 1), lambda bi, ci: (ci, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, d), lambda bi, ci: (bi, ci, 0)),
            out_shape=jax.ShapeDtypeStruct((b, p_len, d), qkv.dtype),
            interpret=interpret,
        )(qkv, cos.astype(qkv.dtype), sin.astype(qkv.dtype),
          valid.astype(jnp.float32)[:, None])

    q, k, v = jnp.split(qkv, 3, axis=-1)

    def fold(x):                                           # → [B·H, P, hd]
        return (x.reshape(b, p_len, num_heads, hd)
                 .transpose(0, 2, 1, 3).reshape(b * num_heads, p_len, hd))

    # Rope tables ride in the compute dtype (bf16 inputs → bf16 rope, the
    # fast path of models/layers.apply_rope; fp32 stays exact for tests).
    cos = cos.astype(qkv.dtype)
    sin = sin.astype(qkv.dtype)
    valid_f = valid.astype(jnp.float32)[:, None]           # [P, 1]

    kernel = functools.partial(_window_kernel, scale=scale,
                               window_len=window_len)
    out = pl.pallas_call(
        kernel,
        grid=(b * num_heads, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rows, hd), lambda bh, ci: (bh, ci, 0)),
            pl.BlockSpec((1, rows, hd), lambda bh, ci: (bh, ci, 0)),
            pl.BlockSpec((1, rows, hd), lambda bh, ci: (bh, ci, 0)),
            pl.BlockSpec((rows, hd), lambda bh, ci: (ci, 0)),
            pl.BlockSpec((rows, hd), lambda bh, ci: (ci, 0)),
            pl.BlockSpec((rows, 1), lambda bh, ci: (ci, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, hd), lambda bh, ci: (bh, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((b * num_heads, p_len, hd), qkv.dtype),
        interpret=interpret,
    )(fold(q), fold(k), fold(v), cos, sin, valid_f)

    return (out.reshape(b, num_heads, p_len, hd)
               .transpose(0, 2, 1, 3).reshape(b, p_len, d))
