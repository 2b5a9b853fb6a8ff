"""Fused append + paged GQA attention (Pallas TPU): the decode hot loop.

One kernel per decoder layer per step does BOTH halves of paged-cache
attention that the unfused path paid separately:

1. **Append**: the step's new k/v rows DMA straight into their pool page
   (position ``start + i`` of the slot's block table) — replacing the XLA
   scatter that cost 1.8 ms/step at 7B batch 8 (scatter serializes; the
   DMA is ~2 KB of actual traffic).
2. **Attend**: per-slot paged flash attention over the length-bounded
   pages with double-buffered page DMAs (one 64 KB copy per page covers
   every KV head — the pool is page-major ``[N, BS, H_kv, D]``), online
   softmax in fp32.

One grid instance per slot; the page loop is a dynamic ``fori_loop`` (no
unrolling — ladder-width recompiles stay cheap) with the next page's DMA
in flight while the current one computes.

Handles every decode-shaped forward through one code path:
- plain decode step: T = 1, ``n_valid`` 1 (live) / 0 (done slot)
- guided-decode string chunks: ``n_valid`` = auto mask
- speculative verify: T = K+1, ``n_valid`` = drafts+1, causal within the
  block (query i attends through absolute position ``start + i``)
- tiny fresh prefills (T <= 64 when the flash path is off): ``n_valid``
  = true prompt length

Inactive slots (``n_valid == 0``) skip the append AND every page DMA —
they cost nothing, which is what makes mixed live/dead decode batches
cheap (VERDICT round 1: finished pages must stop paying).

Replaces jax.experimental paged_attention here: that kernel is read-only
(scatter stays), q_len==1 only (speculative verify needed a virtual-row
detour), and head-major (4 small DMAs per page instead of 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -0.7 * float(np.finfo(np.float32).max)


def _kernel(tables_ref, start_ref, nvalid_ref,           # scalar prefetch
            q_ref, k_new_ref, v_new_ref, _k_in, _v_in,   # inputs
            o_ref, k_pool_ref, v_pool_ref,               # outputs (pools aliased)
            k_buf, v_buf, m_ref, l_ref, acc_ref,
            k_sems, v_sems, ak_sem, av_sem,
            *, layer: int, t: int, scale: float):
    s = pl.program_id(0)
    _, n_pages_table = tables_ref.shape
    bs = k_buf.shape[1]
    start = start_ref[s]
    nv = nvalid_ref[s]
    limit = start + nv                      # kv positions to attend over
    cap = n_pages_table * bs - 1            # last writable position

    # ---- append new k/v rows (token i lands at position start + i) ----
    def append_copy(i, pool_ref, new_ref, sem):
        pos = jnp.minimum(start + i, cap)
        block = tables_ref[s, pos // bs]
        return pltpu.make_async_copy(new_ref.at[0, i],
                                     pool_ref.at[layer, block, pos % bs],
                                     sem)

    for i in range(t):
        @pl.when(i < nv)
        def _start_append(i=i):
            append_copy(i, k_pool_ref, k_new_ref, ak_sem).start()
            append_copy(i, v_pool_ref, v_new_ref, av_sem).start()
    for i in range(t):
        @pl.when(i < nv)
        def _wait_append(i=i):
            append_copy(i, k_pool_ref, k_new_ref, ak_sem).wait()
            append_copy(i, v_pool_ref, v_new_ref, av_sem).wait()

    # ---- paged flash attention over pages [0, ceil(limit / bs)) ----
    hkv, gt, d = acc_ref.shape
    q = q_ref[0].astype(jnp.float32) * scale             # [Hkv, GT, D]
    n_pages = jnp.where(nv > 0, (limit + bs - 1) // bs, 0)
    # Query row r is token r % t; it may attend absolute cols <= start + r%t.
    row_max = start + jax.lax.broadcasted_iota(
        jnp.int32, (hkv, gt, bs), 1) % t

    def page_dma(p, buf):
        block = tables_ref[s, p]
        return (pltpu.make_async_copy(k_pool_ref.at[layer, block],
                                      k_buf.at[buf], k_sems.at[buf]),
                pltpu.make_async_copy(v_pool_ref.at[layer, block],
                                      v_buf.at[buf], v_sems.at[buf]))

    m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(n_pages > 0)
    def _start_first():
        dk, dv = page_dma(0, 0)
        dk.start()
        dv.start()

    def body(p, _):
        buf = jax.lax.rem(p, 2)

        @pl.when(p + 1 < n_pages)
        def _prefetch_next():
            dk, dv = page_dma(p + 1, 1 - buf)
            dk.start()
            dv.start()

        dk, dv = page_dma(p, buf)
        dk.wait()
        dv.wait()
        k = k_buf[buf].astype(jnp.float32)               # [BS, Hkv, D]
        v = v_buf[buf].astype(jnp.float32)
        scores = jnp.stack([                              # [Hkv, GT, BS]
            jax.lax.dot_general(q[h], k[:, h, :], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for h in range(hkv)])
        col = p * bs + jax.lax.broadcasted_iota(
            jnp.int32, (hkv, gt, bs), 2)
        scores = jnp.where(col <= row_max, scores, _NEG_INF)

        m_prev = m_ref[...]                               # [Hkv, GT, 128]
        m_cur = jnp.max(scores, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        safe_m = jnp.where(m_new == _NEG_INF, 0.0, m_new)
        p_exp = jnp.exp(scores - safe_m[..., :1])
        p_exp = jnp.where(col <= row_max, p_exp, 0.0)
        correction = jnp.where(m_prev == _NEG_INF, 0.0,
                               jnp.exp(m_prev - safe_m))
        l_ref[...] = (correction * l_ref[...]
                      + jnp.sum(p_exp, axis=-1, keepdims=True))
        pv = jnp.stack([                                  # [Hkv, GT, D]
            jax.lax.dot_general(p_exp[h], v[:, h, :], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for h in range(hkv)])
        acc_ref[...] = acc_ref[...] * correction[..., :d] + pv
        m_ref[...] = m_new
        return ()

    jax.lax.fori_loop(0, n_pages, body, ())
    denom = jnp.maximum(l_ref[...][..., :d], 1e-30)
    o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("layer", "scale", "interpret"))
def paged_append_attention(
    q: jax.Array,        # [S, T, Hq, D]
    k_new: jax.Array,    # [S, T, Hkv, D]
    v_new: jax.Array,    # [S, T, Hkv, D]
    k_pool: jax.Array,   # [L, N, BS, Hkv, D] (donated: appended in place)
    v_pool: jax.Array,   # [L, N, BS, Hkv, D]
    tables: jax.Array,   # [S, W] int32 pool block ids (ladder-narrowed)
    start: jax.Array,    # [S] int32 tokens already cached
    n_valid: jax.Array,  # [S] int32 real tokens this call (0 = skip slot)
    *,
    layer: int,
    scale: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Append ``k_new/v_new`` into layer ``layer`` of the pools and return
    (attention output [S, T, Hq, D], k_pool, v_pool).

    Callers must guarantee ``start + n_valid <= W * BS`` for live slots
    (the serving ladder passes a margin); query token i attends through
    absolute position ``start + i`` (causal within the new block).
    """
    s, t, hq, d = q.shape
    hkv = k_new.shape[2]
    g = hq // hkv
    gt = g * t
    gt_pad = max(8, -(-gt // 8) * 8)
    # [S, T, Hq, D] -> [S, Hkv, G*T, D]; row r of a head group is token r % T
    qr = (q.transpose(0, 2, 1, 3)
           .reshape(s, hkv, g, t, d)
           .reshape(s, hkv, gt, d))
    if gt_pad != gt:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, gt_pad - gt), (0, 0)))

    kernel = functools.partial(_kernel, layer=layer, t=t, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, hkv, gt_pad, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, t, hkv, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, t, hkv, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, hkv, gt_pad, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2,) + k_pool.shape[2:], k_pool.dtype),  # page bufs
            pltpu.VMEM((2,) + v_pool.shape[2:], v_pool.dtype),
            pltpu.VMEM((hkv, gt_pad, 128), jnp.float32),  # running max
            pltpu.VMEM((hkv, gt_pad, 128), jnp.float32),  # running sum
            pltpu.VMEM((hkv, gt_pad, d), jnp.float32),    # accumulator
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, k_pool, v_pool = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s, hkv, gt_pad, d), q.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        # operand order: 3 prefetch scalars, q, k_new, v_new, k_pool, v_pool
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tables, start.astype(jnp.int32), n_valid.astype(jnp.int32),
      qr, k_new, v_new, k_pool, v_pool)

    out = (out[:, :, :gt]
           .reshape(s, hkv, g, t, d)
           .reshape(s, hq, t, d)
           .transpose(0, 2, 1, 3))
    return out, k_pool, v_pool
