"""Fused append + paged GQA attention (Pallas TPU): the decode hot loop.

One kernel invocation per decoder layer per step (a single compiled
kernel — the layer index is a scalar-prefetch operand, so the lax.scan
over stacked layer params reuses it) does BOTH halves of paged-cache
attention that the unfused path paid separately:

1. **Append**: the step's new k/v rows DMA straight into their pool page
   (position ``start + i`` of the slot's block table) — replacing the XLA
   scatter that cost 1.8 ms/step at 7B batch 8 (scatter serializes; the
   DMA is ~2 KB of actual traffic).
2. **Attend**: per-slot paged flash attention over the length-bounded
   pages, 8 pages per compute chunk (their DMAs in flight together, one
   contiguous copy per page covering every KV head — the pool is
   page-major ``[N, BS, H_kv, D]``), online softmax in fp32.

One grid instance per slot; the chunk loop is a dynamic ``fori_loop``
(no unrolling — ladder-width recompiles stay cheap) with the next
chunk's DMAs in flight while the current one computes.

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

# KV BYTES per compute chunk (per pool): pages group into chunks of
# ppc = _CHUNK_BYTES / page_bytes — one softmax update per chunk with
# all its page DMAs in flight together, amortizing the ~20 us/iteration
# vector-op overhead a page-at-a-time loop pays. A BYTE budget (not a
# token count) is the invariant that transfers across head counts and
# pool dtypes: 256 KB reproduces the tuned 4-pages/512-token chunk at
# the 7B read shapes (4 KV heads, int8) AND the measured-best
# 2-pages/256-token chunk at the 8B reasoning shapes (8 KV heads, int8
# — the 512-token chunk there ran 107 us/layer vs 87 at 256; round-5
# sweep). Env-tunable for sweeps.
_CHUNK_BYTES = int(__import__("os").environ.get(
    "HOCR_PAGED_CHUNK_BYTES", str(256 * 1024)))


def _kernel(layer_ref, tables_ref, start_ref, nvalid_ref,  # scalar prefetch
            q_ref, k_new_ref, v_new_ref, *rest,
            t: int, scale: float, quant: bool):
    # Dynamic layer index (scalar-prefetch): ONE compiled kernel serves
    # every decoder layer, so a lax.scan over stacked layer params reuses
    # it — 28 static-layer instances per program was the dominant cold-
    # compile cost on a 1-core host.
    layer = layer_ref[0]
    if quant:
        (_k_in, _v_in, _ks_in, _vs_in,
         o_ref, k_pool_ref, v_pool_ref, ks_pool_ref, vs_pool_ref,
         k_buf, v_buf, ks_buf, vs_buf, qk_row, qv_row, ks_stage, vs_stage,
         m_ref, l_ref, acc_ref,
         k_sems, v_sems, ak_sem, av_sem) = rest
    else:
        (_k_in, _v_in,
         o_ref, k_pool_ref, v_pool_ref,
         k_buf, v_buf, m_ref, l_ref, acc_ref,
         k_sems, v_sems, ak_sem, av_sem) = rest
    s = pl.program_id(0)
    _, n_pages_table = tables_ref.shape
    bs = k_buf.shape[2]                     # (2, PPC, BS, Hkv, D)
    start = start_ref[s]
    nv = nvalid_ref[s]
    limit = start + nv                      # kv positions to attend over
    cap = n_pages_table * bs - 1            # last writable position

    # ---- append new k/v rows (token i lands at position start + i) ----
    if quant:
        # Quantize the new rows first (per token per head: amax/127 over
        # D), staging int8 data in scratch for the DMAs.
        kn = k_new_ref[0].astype(jnp.float32)            # [T, Hkv, D]
        vn = v_new_ref[0].astype(jnp.float32)
        ksc = jnp.maximum(jnp.max(jnp.abs(kn), axis=-1), 1e-6) / 127.0
        vsc = jnp.maximum(jnp.max(jnp.abs(vn), axis=-1), 1e-6) / 127.0
        qk_row[...] = jnp.round(kn / ksc[..., None]).astype(jnp.int8)
        qv_row[...] = jnp.round(vn / vsc[..., None]).astype(jnp.int8)
        k_src, v_src = qk_row, qv_row
    else:
        k_src, v_src = k_new_ref.at[0], v_new_ref.at[0]

    def append_copies(i):
        pos = jnp.minimum(start + i, cap)
        block = tables_ref[s, pos // bs]
        return (pltpu.make_async_copy(
                    k_src.at[i], k_pool_ref.at[layer, block, pos % bs],
                    ak_sem),
                pltpu.make_async_copy(
                    v_src.at[i], v_pool_ref.at[layer, block, pos % bs],
                    av_sem))

    for i in range(t):
        @pl.when(i < nv)
        def _start_append(i=i):
            dk, dv = append_copies(i)
            dk.start()
            dv.start()
    for i in range(t):
        @pl.when(i < nv)
        def _wait_append(i=i):
            dk, dv = append_copies(i)
            dk.wait()
            dv.wait()

    if quant:
        # Scale appends: the scale pool is [L, N, Hkv, BS] (BS minor so
        # page copies stay 128-lane aligned; per-token slices would not
        # be), so appending is a read-modify-write of the whole 2 KB
        # scale page: DMA it in, splice the new tokens' scales with a
        # masked select, DMA it back. Tokens span at most two pages
        # (T <= 64 <= BS).
        hkv_ = qk_row.shape[1]
        p_first = start // bs
        p_extra = (start + jnp.maximum(nv, 1) - 1) // bs  # last touched

        for j in range(2):
            @pl.when(((j == 0) & (nv > 0))
                     | ((j == 1) & (nv > 0) & (p_extra > p_first)))
            def _scale_rmw(j=j):
                pj = jnp.minimum(p_first + j, n_pages_table - 1)
                blk = tables_ref[s, pj]
                rk = pltpu.make_async_copy(
                    ks_pool_ref.at[layer, blk], ks_stage, ak_sem)
                rv = pltpu.make_async_copy(
                    vs_pool_ref.at[layer, blk], vs_stage, av_sem)
                rk.start()
                rv.start()
                rk.wait()
                rv.wait()
                col = jax.lax.broadcasted_iota(jnp.int32, (hkv_, bs), 1)
                ks_new = ks_stage[...]
                vs_new = vs_stage[...]
                for i in range(t):
                    pos = start + i
                    sel = ((i < nv) & (pos // bs == pj)
                           & (col == pos % bs))
                    ks_new = jnp.where(sel, ksc[i][:, None], ks_new)
                    vs_new = jnp.where(sel, vsc[i][:, None], vs_new)
                ks_stage[...] = ks_new
                vs_stage[...] = vs_new
                wk = pltpu.make_async_copy(
                    ks_stage, ks_pool_ref.at[layer, blk], ak_sem)
                wv = pltpu.make_async_copy(
                    vs_stage, vs_pool_ref.at[layer, blk], av_sem)
                wk.start()
                wv.start()
                wk.wait()
                wv.wait()

    # ---- paged flash attention over pages [0, ceil(limit / bs)) ----
    # Pages group into CHUNKS of ppc pages: every chunk is one compute
    # block (one softmax update over ppc*bs columns) fed by ppc parallel
    # page DMAs into one contiguous buffer, double-buffered across
    # chunks. Per-iteration vector-op overhead — not DMA bandwidth — is
    # what dominates a page-at-a-time loop (measured ~20 us/iteration at
    # 7B serving shapes), so amortizing it over 8 pages is the win.
    hkv, gt, d = acc_ref.shape
    _, ppc, bs, _, _ = k_buf.shape                       # (2, PPC, BS, H, D)
    cols_per_chunk = ppc * bs
    q = q_ref[0].astype(jnp.float32) * scale             # [Hkv, GT, D]
    n_pages = jnp.where(nv > 0, (limit + bs - 1) // bs, 0)
    n_chunks = (n_pages + ppc - 1) // ppc
    # Query row r is token r % t; it may attend absolute cols <= start + r%t.
    row_max = start + jax.lax.broadcasted_iota(
        jnp.int32, (hkv, gt, cols_per_chunk), 1) % t

    def chunk_copies(c, buf):
        """(started-under-guard) DMA descriptors for chunk c's pages.
        The table read clamps: a partial final chunk constructs (but
        never starts) descriptors for pages past the table width."""
        out = []
        for i in range(ppc):
            page = c * ppc + i
            block = tables_ref[s, jnp.minimum(page, n_pages_table - 1)]
            copies = [
                pltpu.make_async_copy(
                    k_pool_ref.at[layer, block],
                    k_buf.at[buf, i], k_sems.at[buf]),
                pltpu.make_async_copy(
                    v_pool_ref.at[layer, block],
                    v_buf.at[buf, i], v_sems.at[buf])]
            if quant:
                copies += [
                    pltpu.make_async_copy(
                        ks_pool_ref.at[layer, block],
                        ks_buf.at[buf, i], k_sems.at[buf]),
                    pltpu.make_async_copy(
                        vs_pool_ref.at[layer, block],
                        vs_buf.at[buf, i], v_sems.at[buf])]
            out.append((page, copies))
        return out

    def start_chunk(c, buf):
        for page, copies in chunk_copies(c, buf):
            @pl.when(page < n_pages)
            def _go(copies=copies):
                for dma in copies:
                    dma.start()

    def wait_chunk(c, buf):
        for page, copies in chunk_copies(c, buf):
            @pl.when(page < n_pages)
            def _done(copies=copies):
                for dma in copies:
                    dma.wait()

    m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    # Rows of a partial chunk that never load must hold FINITE data: the
    # softmax mask zeroes their probabilities, but 0 * NaN from
    # uninitialized VMEM would still poison the p@v accumulation. One
    # memset before any DMA covers every never-loaded row; rows reused
    # across chunks hold stale (finite) page data, equally harmless.
    k_buf[...] = jnp.zeros_like(k_buf)
    v_buf[...] = jnp.zeros_like(v_buf)
    if quant:
        ks_buf[...] = jnp.zeros_like(ks_buf)
        vs_buf[...] = jnp.zeros_like(vs_buf)

    @pl.when(n_chunks > 0)
    def _warm():
        start_chunk(0, 0)

    def body(c, _):
        buf = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch_next():
            start_chunk(c + 1, 1 - buf)

        wait_chunk(c, buf)
        # Unloaded pages of a partial final chunk hold stale buffer data;
        # the col <= row_max mask (row_max < limit <= loaded extent)
        # already excludes every such column.
        k = k_buf[buf].astype(jnp.float32).reshape(cols_per_chunk, hkv, d)
        v = v_buf[buf].astype(jnp.float32).reshape(cols_per_chunk, hkv, d)
        # Head-dim strategy (both measured, round 5): at >=8 KV heads a
        # single head-batched dot beats the unrolled per-head loop's
        # 2*Hkv small-dot Mosaic overhead (8B reasoning: 102 -> 67
        # us/layer), but the in-VMEM [cols, Hkv, D] -> [Hkv, cols, D]
        # f32 relayouts it needs cost MORE than the loop saves at 4 KV
        # heads x 24 slots (7B read: 86 -> 236 us/layer regression), so
        # few-head shapes keep the loop.
        batched_heads = hkv >= 8
        if batched_heads:
            k_t = k.transpose(1, 0, 2)             # [Hkv, PPC*BS, D]
            v_t = v.transpose(1, 0, 2)
            scores = jax.lax.dot_general(          # [Hkv, GT, PPC*BS]
                q, k_t, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            scores = jnp.stack([
                jax.lax.dot_general(q[h], k[:, h, :],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for h in range(hkv)])
        if quant:
            # Dequantize in SCORE space: scale is per (head, column), so
            # scores *= k_scale[h, col] and later p_exp *= v_scale. The
            # [PPC, Hkv, BS] scale buffers flatten to [Hkv, 1, PPC*BS]
            # via a lane-dim CONCAT over the static page dim — the
            # sublane->lane merge expressed as transpose+reshape is an
            # unsupported Mosaic shape cast at sub-128 lane widths
            # (vector<2x8x64> -> vector<2x1x512> failed at the tiny
            # trained-fidelity config), while per-page lane concatenation
            # compiles at every shape. (A minor-dim transpose to match
            # k's rows would be an expensive sublane/lane relayout.)
            def flat_scales(buf_ref):
                pages = buf_ref[buf]                   # [PPC, Hkv, BS]
                return jnp.concatenate(
                    [pages[i] for i in range(ppc)], axis=-1)[:, None, :]

            ks = flat_scales(ks_buf)                   # [Hkv, 1, PPC*BS]
            vs = flat_scales(vs_buf)
            scores = scores * ks
        col = c * cols_per_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (hkv, gt, cols_per_chunk), 2)
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
        if quant:
            # Fold v's dequant into the probabilities AFTER the
            # normalizer sum (l must sum unscaled probabilities).
            p_exp = p_exp * vs
        if batched_heads:
            pv = jax.lax.dot_general(                     # [Hkv, GT, D]
                p_exp, v_t, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            pv = jnp.stack([
                jax.lax.dot_general(p_exp[h], v[:, h, :],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for h in range(hkv)])
        acc_ref[...] = acc_ref[...] * correction[..., :d] + pv
        m_ref[...] = m_new
        return ()

    jax.lax.fori_loop(0, n_chunks, body, ())
    denom = jnp.maximum(l_ref[...][..., :d], 1e-30)
    o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret"))
def paged_append_attention(
    q: jax.Array,        # [S, T, Hq, D]
    k_new: jax.Array,    # [S, T, Hkv, D]
    v_new: jax.Array,    # [S, T, Hkv, D]
    k_pool: jax.Array,   # [L, N, BS, Hkv, D] (donated: appended in place)
    v_pool: jax.Array,   # [L, N, BS, Hkv, D]
    tables: jax.Array,   # [S, W] int32 pool block ids (ladder-narrowed)
    start: jax.Array,    # [S] int32 tokens already cached
    n_valid: jax.Array,  # [S] int32 real tokens this call (0 = skip slot)
    k_scale_pool: jax.Array | None = None,   # [L, N, Hkv, BS] f32 (int8 KV)
    v_scale_pool: jax.Array | None = None,
    *,
    layer: int | jax.Array,
    scale: float,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """Append ``k_new/v_new`` into layer ``layer`` of the pools and return
    ``(attention output [S, T, Hq, D], k_pool, v_pool)`` — plus the two
    scale pools when the cache is int8-quantized (``k_scale_pool`` set):
    new rows then quantize in-kernel (per token per head, amax/127 over
    D) and pages dequantize after their DMA.

    Callers must guarantee ``start + n_valid <= W * BS`` for live slots
    (the serving ladder passes a margin); query token i attends through
    absolute position ``start + i`` (causal within the new block).
    """
    quant = k_scale_pool is not None
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

    bs = k_pool.shape[2]
    if quant and t > bs:
        # The in-kernel scale-page read-modify-write touches exactly two
        # pages, which covers appends only while the new tokens span at
        # most one page boundary (t <= BS). Larger appends would silently
        # drop scales for the third page, corrupting dequantization.
        raise ValueError(
            f"int8-KV append of {t} tokens exceeds the block size {bs}; "
            "the scale RMW covers at most two pages (t <= block_size)")
    page_bytes = bs * hkv * d * k_pool.dtype.itemsize
    ppc = max(1, _CHUNK_BYTES // page_bytes)
    kernel = functools.partial(_kernel, t=t, scale=scale, quant=quant)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_pools = 4 if quant else 2
    in_specs = [
        pl.BlockSpec((1, hkv, gt_pad, d), lambda i, *_: (i, 0, 0, 0)),
        pl.BlockSpec((1, t, hkv, d), lambda i, *_: (i, 0, 0, 0)),
        pl.BlockSpec((1, t, hkv, d), lambda i, *_: (i, 0, 0, 0)),
    ] + [any_spec] * n_pools
    out_specs = [
        pl.BlockSpec((1, hkv, gt_pad, d), lambda i, *_: (i, 0, 0, 0)),
    ] + [any_spec] * n_pools
    scratch_shapes = [
        # chunk buffers: (double-buffer, pages/chunk, BS, Hkv[, D])
        pltpu.VMEM((2, ppc) + k_pool.shape[2:], k_pool.dtype),
        pltpu.VMEM((2, ppc) + v_pool.shape[2:], v_pool.dtype),
    ]
    if quant:
        scratch_shapes += [
            pltpu.VMEM((2, ppc, hkv, bs), jnp.float32),   # scale chunks
            pltpu.VMEM((2, ppc, hkv, bs), jnp.float32),
            pltpu.VMEM((t, hkv, d), jnp.int8),            # staged int8 rows
            pltpu.VMEM((t, hkv, d), jnp.int8),
            pltpu.VMEM((hkv, bs), jnp.float32),           # scale-page RMW
            pltpu.VMEM((hkv, bs), jnp.float32),
        ]
    scratch_shapes += [
        pltpu.VMEM((hkv, gt_pad, 128), jnp.float32),      # running max
        pltpu.VMEM((hkv, gt_pad, 128), jnp.float32),      # running sum
        pltpu.VMEM((hkv, gt_pad, d), jnp.float32),        # accumulator
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(s,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=scratch_shapes)
    out_shape = [
        jax.ShapeDtypeStruct((s, hkv, gt_pad, d), q.dtype),
        jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
        jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
    ]
    # operand order: 4 prefetch scalars, q, k_new, v_new, then the pools
    aliases = {7: 1, 8: 2}
    operands = [jnp.asarray(layer, jnp.int32).reshape(1),
                tables, start.astype(jnp.int32), n_valid.astype(jnp.int32),
                qr, k_new, v_new, k_pool, v_pool]
    if quant:
        out_shape += [jax.ShapeDtypeStruct(k_scale_pool.shape, jnp.float32),
                      jax.ShapeDtypeStruct(v_scale_pool.shape, jnp.float32)]
        aliases.update({9: 3, 10: 4})
        operands += [k_scale_pool, v_scale_pool]
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*operands)
    out, *pools = results

    out = (out[:, :, :gt]
           .reshape(s, hkv, g, t, d)
           .reshape(s, hq, t, d)
           .transpose(0, 2, 1, 3))
    return (out, *pools)
