"""Paged KV cache: block-pool attention state for continuous batching.

Replaces the reference's one-`generate`-per-call decoding (tools.py:764-765)
and round 1's contiguous per-batch ``prompt_len + max_new`` preallocation
with the serving-grade design (BASELINE.json north star: "paged KV-cache"):

- One shared **block pool** ``[L, H_kv, n_blocks, block_size, D]`` holds
  every live sequence's keys/values. Short requests take few blocks; blocks
  free the moment a sequence finishes, so memory is sized for the workload
  mix, not ``batch x worst_case``.
- **Slots**: a fixed decode batch of S slots (static shapes — one compiled
  program for the life of the server). Each slot owns a row of
  ``block_tables [S, max_blocks]`` mapping logical block -> pool block.
- **Pool block 0 is a reserved trash sink**: free slots' tables are all
  zeros, so their (masked, never-read) writes land somewhere harmless.

TPU-first properties: every shape is static; the pool layout is page-
major (a page is one contiguous ``[block_size, H_kv, D]`` slab) so the
fused decode kernel (ops/paged_decode_attention) fetches a page in one
DMA and appends a token's k/v in one copy — no XLA scatter, no gathered
window copy, only each slot's length-bounded pages ever leave HBM; the
decode loop is a single ``lax.while_loop`` dispatch per chunk; the pool
threads through jit with donation so it never copies.

Position ids follow models/qwen25vl/language.py: ``[B, T]`` for 1D RoPE
(Qwen3) or ``[3, B, T]`` for M-RoPE (Qwen2.5-VL); text decode steps carry
equal ids in all three planes offset by the per-slot rope delta.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from handwritten_ocr_tpu.models.layers import (
    apply_rope,
    attention,
    linear,
    rms_norm,
    swiglu_mlp,
)
from handwritten_ocr_tpu.models.qwen25vl.language import mrope_cos_sin


class PagedKVCache(NamedTuple):
    """Block-pool KV state shared by all live sequences.

    ``k_scale``/``v_scale`` are set only for the int8-quantized cache:
    data pools hold int8 rows, the scale pools the per-token/per-head
    f32 dequantization factors (amax/127 over D). Halves KV HBM and
    page-DMA bytes — what lets 16 GB chips serve wide slot counts at
    the 2,048-token contract.
    """

    k: jax.Array             # [L, n_blocks, block_size, H_kv, D]
    v: jax.Array             # [L, n_blocks, block_size, H_kv, D]
    block_tables: jax.Array  # [S, max_blocks] int32 pool indices (0 = trash)
    lengths: jax.Array       # [S] int32 tokens cached per slot
    # Scale pools keep block_size MINOR (vs the data pools' head-minor
    # page rows) so whole-scale-page DMAs stay 128-lane aligned:
    k_scale: jax.Array | None = None   # [L, n_blocks, H_kv, block_size] f32
    v_scale: jax.Array | None = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def block_size(self) -> int:
        return self.k.shape[2]

    @property
    def max_context(self) -> int:
        return self.block_tables.shape[1] * self.block_size

    @classmethod
    def zeros(cls, num_layers: int, n_blocks: int, block_size: int,
              n_slots: int, max_blocks: int, num_kv_heads: int,
              head_dim: int, dtype=jnp.bfloat16,
              kv_quant: bool = False) -> "PagedKVCache":
        # Page-major layout: one page is a contiguous [BS, H_kv, D] slab,
        # so the decode kernel fetches a page (all KV heads) in ONE DMA
        # and appends a token's k/v (all heads) in one [H_kv, D] copy.
        shape = (num_layers, n_blocks, block_size, num_kv_heads, head_dim)
        if kv_quant:
            scale_shape = (num_layers, n_blocks, num_kv_heads, block_size)
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                block_tables=jnp.zeros((n_slots, max_blocks), jnp.int32),
                lengths=jnp.zeros((n_slots,), jnp.int32),
                k_scale=jnp.zeros(scale_shape, jnp.float32),
                v_scale=jnp.zeros(scale_shape, jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            block_tables=jnp.zeros((n_slots, max_blocks), jnp.int32),
            lengths=jnp.zeros((n_slots,), jnp.int32),
        )


def _quantize_rows(new: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-token/per-head int8 quantization of [B, T, H, D] rows —
    bit-matches the kernel's in-kernel append quantization."""
    f = new.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(f), axis=-1), 1e-6) / 127.0
    q = jnp.round(f / scales[..., None]).astype(jnp.int8)
    return q, scales


def _scatter_rows(pool: jax.Array, layer_idx: int, blocks: jax.Array,
                  offsets: jax.Array, flat: jax.Array) -> jax.Array:
    return pool.at[layer_idx, blocks, offsets].set(
        flat.astype(pool.dtype))


def _write(pools: tuple, layer_idx: int, tables: jax.Array,
           start: jax.Array, k: jax.Array, v: jax.Array) -> tuple:
    """Scatter new ``k/v [B, T, H, D]`` into layer ``layer_idx`` of the
    pool tuple ``(k, v, k_scale|None, v_scale|None)`` at positions
    ``start[b] + t`` of each row's block table; int8 pools quantize the
    rows first (same formula as the fused kernel's in-kernel append).
    Returns the updated tuple (in-place under jit). Used by the prefill
    and portable paths; the fused decode kernel appends via DMA."""
    k_pool, v_pool, ks_pool, vs_pool = pools
    b, t, h, d = k.shape
    block_size = k_pool.shape[2]
    pos = start[:, None] + jnp.arange(t)[None, :]                # [B, T]
    pos = jnp.minimum(pos, tables.shape[1] * block_size - 1)
    blocks = jnp.take_along_axis(tables, pos // block_size, axis=1)
    blocks = blocks.reshape(-1)
    offsets = (pos % block_size).reshape(-1)
    if ks_pool is not None:
        kq, ks = _quantize_rows(k)
        vq, vs = _quantize_rows(v)
        # scale pools are [L, N, H, BS] (BS minor for the kernel's
        # aligned page DMAs): scatter at (block, head-slice, offset).
        ks_pool = ks_pool.at[layer_idx, blocks, :, offsets].set(
            ks.reshape(b * t, h))
        vs_pool = vs_pool.at[layer_idx, blocks, :, offsets].set(
            vs.reshape(b * t, h))
        return (_scatter_rows(k_pool, layer_idx, blocks, offsets,
                              kq.reshape(b * t, h, d)),
                _scatter_rows(v_pool, layer_idx, blocks, offsets,
                              vq.reshape(b * t, h, d)),
                ks_pool, vs_pool)
    return (_scatter_rows(k_pool, layer_idx, blocks, offsets,
                          k.reshape(b * t, h, d)),
            _scatter_rows(v_pool, layer_idx, blocks, offsets,
                          v.reshape(b * t, h, d)),
            None, None)


def _gather(pool: jax.Array, layer_idx: int, tables: jax.Array,
            scale_pool: jax.Array | None = None) -> jax.Array:
    """Materialize one layer's cache window for the given rows (portable
    fallback path), dequantizing int8 pools: [B, max_ctx, H, D]."""
    g = pool[layer_idx][tables]                    # [B, MB, BS, H, D]
    b = g.shape[0]
    if scale_pool is not None:
        scales = scale_pool[layer_idx][tables]     # [B, MB, H, BS]
        g = g.astype(jnp.float32) * scales.transpose(0, 1, 3, 2)[..., None]
    return g.reshape(b, -1, g.shape[-2], g.shape[-1])


def _paged_self_attention(layer: dict, cfg, x: jax.Array, cos, sin,
                          layer_idx: int, pools: tuple,
                          tables: jax.Array, start: jax.Array,
                          n_valid: jax.Array, fresh: bool):
    """One attention layer over the paged pool tuple
    ``(k, v, k_scale|None, v_scale|None)``.

    x: [B, T, D] current tokens (prompt for prefill, single step for
    decode); start[b] = tokens already cached for row b; n_valid[b] = how
    many of this call's T tokens are real for row b (0 = skip the row
    entirely). Fresh prefill (start == 0) attends only to itself, so it
    takes the Pallas flash kernel straight on the current k/v; decode-
    shaped calls (T <= 64) run the fused append+attention kernel
    (ops/paged_decode_attention: in-kernel k/v append replacing the XLA
    scatter, length-bounded pipelined page DMAs, int8 KV quantize/
    dequantize in-kernel, zero cost for n_valid == 0 rows); CPU falls
    back to scatter + gather + causal-by-absolute-position mask.
    """
    b, t, _ = x.shape
    hd = cfg.head_dim
    q = linear(layer["q"], x).reshape(b, t, cfg.num_attention_heads, hd)
    k = linear(layer["k"], x).reshape(b, t, cfg.num_key_value_heads, hd)
    v = linear(layer["v"], x).reshape(b, t, cfg.num_key_value_heads, hd)
    if "q_norm" in layer:  # Qwen3 QK-norm
        q = rms_norm(layer["q_norm"], q, cfg.rms_norm_eps)
        k = rms_norm(layer["k_norm"], k, cfg.rms_norm_eps)
    q, k = apply_rope(q, k, cos[:, :, None, :], sin[:, :, None, :])

    from handwritten_ocr_tpu.ops.dispatch import (
        flash_mode, paged_attention_mode)
    if fresh and t > 1 and flash_mode() != "off":
        # Prefill fast path: a fresh slot attends only to its own
        # prompt — causal flash over the current (full-precision)
        # tokens (right-padded garbage rows self-attend harmlessly;
        # their outputs are never read).
        from handwritten_ocr_tpu.ops.flash_attention import flash_attention
        pools = _write(pools, layer_idx, tables, start, k, v)
        out = flash_attention(q, k, v, causal=True, scale=hd ** -0.5,
                              interpret=(flash_mode() == "interpret"))
        return linear(layer["o"], out.reshape(b, t, -1)), pools

    paged_mode = paged_attention_mode()
    # The fused kernel's append DMA slices [Hkv, D] rows out of the
    # tile-padded pool pages; Mosaic requires those slices aligned to the
    # memref tiling (observed: int8 at [4, 128] compiles, [2, 64] is
    # rejected with "slice shape must be aligned to tiling"). Production
    # model families (Qwen2.5-VL 3B/7B/72B, Qwen3 8B/32B) all have
    # head_dim 128 and >= 4 KV heads; exotic small shapes fall back to
    # the portable scatter+gather path instead of failing to compile.
    # The int8 path's scale-page read-modify-write additionally DMAs whole
    # [Hkv, BS] f32 pages; Mosaic pads the lane dim to 128, so a sub-128
    # block_size makes that slice unaligned and the program uncompilable.
    # Production uses config.SERVE_BLOCK_SIZE = 128; exotic block sizes
    # take the portable path below, which quantizes/dequantizes in XLA.
    kernel_aligned = (hd % 128 == 0 and cfg.num_key_value_heads % 4 == 0
                      and (pools[2] is None or pools[0].shape[2] % 128 == 0))
    # int8-KV append cannot span a block boundary (the RMW requantizes
    # exactly one scale page); a t-token append into a sub-t block must
    # take the portable path even in interpret mode.
    int8_spill = pools[2] is not None and t > pools[0].shape[2]
    if (t <= 64 and paged_mode != "off" and not int8_spill
            and (kernel_aligned or paged_mode == "interpret")):
        # Decode steps (t == 1), guided string chunks, speculative verify
        # blocks (t == K+1), and tiny prefills share the fused kernel;
        # query token i attends through absolute position start + i.
        from handwritten_ocr_tpu.ops.paged_decode_attention import (
            paged_append_attention)
        k_pool, v_pool, ks_pool, vs_pool = pools
        kv_dtype = x.dtype if ks_pool is not None else k_pool.dtype
        out, *pools = paged_append_attention(
            q, k.astype(kv_dtype), v.astype(kv_dtype),
            k_pool, v_pool, tables, start, n_valid, ks_pool, vs_pool,
            layer=layer_idx, scale=hd ** -0.5,
            interpret=(paged_mode == "interpret"))
        if len(pools) == 2:
            pools += [None, None]
        return (linear(layer["o"], out.astype(x.dtype).reshape(b, t, -1)),
                tuple(pools))

    pools = _write(pools, layer_idx, tables, start, k, v)
    k_pool, v_pool, ks_pool, vs_pool = pools
    keys = _gather(k_pool, layer_idx, tables, ks_pool)   # [B, CTX, H, D]
    values = _gather(v_pool, layer_idx, tables, vs_pool)
    ctx = keys.shape[1]
    rows = start[:, None, None] + jnp.arange(t)[None, :, None]   # [B, T, 1]
    cols = jnp.arange(ctx)[None, None, :]                        # [1, 1, CTX]
    mask = (cols <= rows)[:, None]                               # [B, 1, T, CTX]

    out = attention(q, keys.astype(q.dtype), values.astype(q.dtype),
                    mask, scale=hd ** -0.5)
    return linear(layer["o"], out.reshape(b, t, -1)), pools


def paged_forward(params: dict, cfg, embeds: jax.Array,
                  position_ids: jax.Array, cache: PagedKVCache,
                  slot_ids: jax.Array, start: jax.Array, new_len: jax.Array,
                  fresh: bool = False, attn_valid: jax.Array | None = None,
                  table_pages: int | None = None,
                  ) -> tuple[jax.Array, PagedKVCache]:
    """Decoder stack over ``embeds [B, T, D]`` with the paged cache.

    slot_ids [B]: which cache slot each batch row belongs to; start [B]:
    tokens already cached per row (0 for fresh prefill); new_len [B]: the
    length to record for each slot afterwards — the TRUE prompt length for
    right-padded prefill (pad-tail writes beyond it are junk that decode
    overwrites position-by-position before ever attending to them), or
    ``start + 1`` for decode steps. ``fresh`` (static) asserts start == 0
    for every row, unlocking the flash-attention prefill path.
    attn_valid (optional): bool [B] — rows whose output is consumed — or
    bool [B, T] marking a per-row PREFIX of real tokens (speculative
    verify). Invalid rows/tokens skip their append and every attention
    page read on the fused TPU kernel path (see _paged_self_attention).
    table_pages (optional, static): attend over only the first N pages of
    each slot's block table — bounds the fused kernel's page loop and the
    fallback's gather width; the serving loop passes the narrowest
    power-of-two width covering every live slot's length plus the chunk.
    Callers must guarantee every VALID row's length (and every write
    position) stays below ``table_pages * block_size``.
    """
    tables = cache.block_tables[slot_ids]          # [B, max_blocks]
    if table_pages is not None and table_pages < tables.shape[1]:
        tables = tables[:, :table_pages]
    # Real tokens per row this call: the fused kernel appends exactly
    # these and bounds each query's causal extent at start + i.
    if attn_valid is None:
        n_valid = new_len - start                  # prefill: true lengths
    elif attn_valid.ndim == 2:
        n_valid = attn_valid.sum(axis=1).astype(jnp.int32)
    else:
        n_valid = jnp.where(attn_valid, new_len - start, 0)
    cos, sin = mrope_cos_sin(cfg, position_ids)
    x = embeds
    pools = (cache.k, cache.v, cache.k_scale, cache.v_scale)

    def layer_step(x, pools, layer, idx):
        attn_out, pools = _paged_self_attention(
            layer["attn"], cfg, rms_norm(layer["ln1"], x, cfg.rms_norm_eps),
            cos, sin, idx, pools, tables, start, n_valid, fresh)
        x = x + attn_out
        x = x + swiglu_mlp(layer["mlp"],
                           rms_norm(layer["ln2"], x, cfg.rms_norm_eps))
        return x, pools

    layers = params["layers"]
    if isinstance(layers, dict):
        # Stacked layout (models/init.stack_layers): scan compiles ONE
        # layer body (and one Pallas kernel instance) for the whole
        # stack instead of an L-times unrolled graph — the difference
        # between minutes and seconds of XLA compile on a 1-core host.
        n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]

        def scan_body(carry, xs):
            layer, idx = xs
            return layer_step(*carry, layer, idx), None

        (x, pools), _ = jax.lax.scan(
            scan_body, (x, pools), (layers, jnp.arange(n_layers)))
    else:                                       # legacy per-layer list
        for idx, layer in enumerate(layers):
            x, pools = layer_step(x, pools, layer, idx)

    x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)

    new_lengths = cache.lengths.at[slot_ids].set(
        jnp.minimum(new_len, cache.max_context))
    new_cache = PagedKVCache(k=pools[0], v=pools[1],
                             block_tables=cache.block_tables,
                             lengths=new_lengths,
                             k_scale=pools[2], v_scale=pools[3])
    return x, new_cache
