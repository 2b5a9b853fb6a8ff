"""Paged KV cache: block-pool attention state for continuous batching.

Replaces the reference's one-`generate`-per-call decoding (tools.py:764-765)
and round 1's contiguous per-batch ``prompt_len + max_new`` preallocation
with the serving-grade design (BASELINE.json north star: "paged KV-cache"):

- One shared **block pool** ``[L, n_blocks, block_size, H_kv, D]`` holds
  every live sequence's keys/values. Short requests take few blocks; blocks
  free the moment a sequence finishes, so memory is sized for the workload
  mix, not ``batch x worst_case``.
- **Slots**: a fixed decode batch of S slots (static shapes — one compiled
  program for the life of the server). Each slot owns a row of
  ``block_tables [S, max_blocks]`` mapping logical block -> pool block.
- **Pool block 0 is a reserved trash sink**: free slots' tables are all
  zeros, so their (masked, never-read) writes land somewhere harmless.

TPU-first properties: every shape is static; writes are advanced-index
scatters, reads are block-table gathers; the decode loop is a single
``lax.fori_loop`` dispatch per chunk; the pool threads through jit with
donation so it never copies.

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
    """Block-pool KV state shared by all live sequences."""

    k: jax.Array             # [L, n_blocks, block_size, H_kv, D]
    v: jax.Array             # [L, n_blocks, block_size, H_kv, D]
    block_tables: jax.Array  # [S, max_blocks] int32 pool indices (0 = trash)
    lengths: jax.Array       # [S] int32 tokens cached per slot

    @property
    def block_size(self) -> int:
        return self.k.shape[2]

    @property
    def max_context(self) -> int:
        return self.block_tables.shape[1] * self.block_size

    @classmethod
    def zeros(cls, num_layers: int, n_blocks: int, block_size: int,
              n_slots: int, max_blocks: int, num_kv_heads: int,
              head_dim: int, dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (num_layers, n_blocks, block_size, num_kv_heads, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            block_tables=jnp.zeros((n_slots, max_blocks), jnp.int32),
            lengths=jnp.zeros((n_slots,), jnp.int32),
        )


def _write(pool: jax.Array, tables: jax.Array, start: jax.Array,
           new: jax.Array) -> jax.Array:
    """Scatter ``new [B, T, H, D]`` into one layer's pool at positions
    ``start[b] + t`` of each row's block table (``tables [B, max_blocks]``)."""
    b, t = new.shape[:2]
    pos = start[:, None] + jnp.arange(t)[None, :]                # [B, T]
    pos = jnp.minimum(pos, tables.shape[1] * pool.shape[1] - 1)
    blocks = jnp.take_along_axis(tables, pos // pool.shape[1], axis=1)
    return pool.at[blocks, pos % pool.shape[1]].set(new.astype(pool.dtype))


def _gather(pool: jax.Array, tables: jax.Array) -> jax.Array:
    """Gather one layer's cache for the given rows: [B, max_ctx, H, D]."""
    g = pool[tables]                                   # [B, MB, BS, H, D]
    return g.reshape(tables.shape[0], -1, *pool.shape[2:])


def _paged_self_attention(layer: dict, cfg, x: jax.Array, cos, sin,
                          layer_idx: int, cache: PagedKVCache,
                          tables: jax.Array, start: jax.Array):
    """One attention layer over the paged cache.

    x: [B, T, D] current tokens (prompt for prefill, single step for
    decode); start[b] = tokens already cached for row b. Writes the new
    k/v into the pool first, then attends over the gathered window with a
    causal-by-absolute-position mask — one code path for prefill (start=0)
    and decode (T=1).
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

    new_k = _write(cache.k[layer_idx], tables, start, k)
    new_v = _write(cache.v[layer_idx], tables, start, v)

    keys = _gather(new_k, tables)                      # [B, CTX, H, D]
    values = _gather(new_v, tables)
    ctx = keys.shape[1]
    rows = start[:, None, None] + jnp.arange(t)[None, :, None]   # [B, T, 1]
    cols = jnp.arange(ctx)[None, None, :]                        # [1, 1, CTX]
    mask = (cols <= rows)[:, None]                               # [B, 1, T, CTX]

    out = attention(q, keys.astype(q.dtype), values.astype(q.dtype),
                    mask, scale=hd ** -0.5)
    return linear(layer["o"], out.reshape(b, t, -1)), new_k, new_v


def paged_forward(params: dict, cfg, embeds: jax.Array,
                  position_ids: jax.Array, cache: PagedKVCache,
                  slot_ids: jax.Array, start: jax.Array, new_len: jax.Array,
                  ) -> tuple[jax.Array, PagedKVCache]:
    """Decoder stack over ``embeds [B, T, D]`` with the paged cache.

    slot_ids [B]: which cache slot each batch row belongs to; start [B]:
    tokens already cached per row (0 for fresh prefill); new_len [B]: the
    length to record for each slot afterwards — the TRUE prompt length for
    right-padded prefill (pad-tail writes beyond it are junk that decode
    overwrites position-by-position before ever attending to them), or
    ``start + 1`` for decode steps.
    """
    tables = cache.block_tables[slot_ids]              # [B, max_blocks]
    cos, sin = mrope_cos_sin(cfg, position_ids)
    x = embeds
    new_ks, new_vs = [], []
    # Thread per-layer pools so each layer reads its own updated blocks.
    for idx, layer in enumerate(params["layers"]):
        attn_out, nk, nv = _paged_self_attention(
            layer["attn"], cfg, rms_norm(layer["ln1"], x, cfg.rms_norm_eps),
            cos, sin, idx, cache, tables, start)
        x = x + attn_out
        x = x + swiglu_mlp(layer["mlp"],
                           rms_norm(layer["ln2"], x, cfg.rms_norm_eps))
        new_ks.append(nk)
        new_vs.append(nv)

    x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)

    new_lengths = cache.lengths.at[slot_ids].set(
        jnp.minimum(new_len, cache.max_context))
    new_cache = PagedKVCache(k=jnp.stack(new_ks), v=jnp.stack(new_vs),
                             block_tables=cache.block_tables,
                             lengths=new_lengths)
    return x, new_cache
