"""Qwen2.5-VL text decoder in JAX: GQA attention + M-RoPE + KV cache.

M-RoPE (multimodal rotary): position ids are [3, B, T] (temporal, height,
width planes); the rotary half-dim is partitioned by ``mrope_section`` with
plane ``i % 3`` supplying chunk ``i`` — text tokens carry equal ids in all
planes and reduce to standard 1D RoPE.

The KV cache is a preallocated [L, B, S_max, H_kv, D] pair updated in place
via dynamic_update_slice — static shapes, jit/pjit friendly; decode mask is
computed from the cache cursor.
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
    rope_inv_freq,
    swiglu_mlp,
)
from handwritten_ocr_tpu.models.qwen25vl.config import TextConfig


class KVCache(NamedTuple):
    """Preallocated per-layer key/value buffers plus the write cursor."""

    k: jax.Array        # [L, B, S_max, H_kv, D]
    v: jax.Array        # [L, B, S_max, H_kv, D]
    cursor: jax.Array   # scalar int32: number of tokens already cached

    @classmethod
    def zeros(cls, num_layers: int, batch: int, max_len: int,
              num_kv_heads: int, head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (num_layers, batch, max_len, num_kv_heads, head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   cursor=jnp.zeros((), jnp.int32))


def mrope_cos_sin(cfg: TextConfig, position_ids: jax.Array):
    """cos/sin [B, T, head_dim] for rotary embedding.

    position_ids [3, B, T] → multimodal M-RoPE via cfg.mrope_section;
    position_ids [B, T]    → standard 1D RoPE (Qwen3 path).
    """
    inv_freq = rope_inv_freq(cfg.head_dim, cfg.rope_theta)
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq
    if position_ids.ndim == 2:
        half = freqs                                                 # [B,T,hd/2]
    else:
        chunks = []
        start = 0
        for i, section in enumerate(cfg.mrope_section):
            chunks.append(freqs[i % 3, :, :, start:start + section])
            start += section
        half = jnp.concatenate(chunks, axis=-1)                      # [B,T,hd/2]
    emb = jnp.concatenate([half, half], axis=-1)                     # [B,T,hd]
    return jnp.cos(emb), jnp.sin(emb)


def _self_attention(
    layer: dict,
    cfg: TextConfig,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    layer_cache: tuple | None,     # (k [B,S,H,D], v, cursor) for this layer
    key_padding: jax.Array | None,
):
    b, t, _ = x.shape
    hd = cfg.head_dim
    q = linear(layer["q"], x).reshape(b, t, cfg.num_attention_heads, hd)
    k = linear(layer["k"], x).reshape(b, t, cfg.num_key_value_heads, hd)
    v = linear(layer["v"], x).reshape(b, t, cfg.num_key_value_heads, hd)
    if "q_norm" in layer:  # Qwen3: per-head-dim RMSNorm before rotary
        q = rms_norm(layer["q_norm"], q, cfg.rms_norm_eps)
        k = rms_norm(layer["k_norm"], k, cfg.rms_norm_eps)
    q, k = apply_rope(q, k, cos[:, :, None, :], sin[:, :, None, :])

    new_k = new_v = None
    cursor = None
    if layer_cache is not None:
        cache_k, cache_v, cursor = layer_cache
        new_k = jax.lax.dynamic_update_slice_in_dim(
            cache_k, k.astype(cache_k.dtype), cursor, axis=1)
        new_v = jax.lax.dynamic_update_slice_in_dim(
            cache_v, v.astype(cache_v.dtype), cursor, axis=1)

    from handwritten_ocr_tpu.ops.dispatch import flash_mode
    mode = flash_mode()
    if t > 1 and key_padding is None and mode != "off":
        # Prefill fast path (Pallas flash): causal over the current tokens.
        # Valid because prefill always runs against an empty cache (the
        # decode loop is strictly t == 1); the cache write above still
        # records k/v for subsequent decode steps.
        from handwritten_ocr_tpu.ops.flash_attention import flash_attention
        out = flash_attention(q, k, v, causal=True, scale=hd ** -0.5,
                              interpret=(mode == "interpret"))
        return linear(layer["o"], out.reshape(b, t, -1)), new_k, new_v

    if layer_cache is None:
        keys, values = k, v
        rows = jnp.arange(t)[:, None]
        cols = jnp.arange(t)[None, :]
        mask = (cols <= rows)[None, None]                            # causal
    else:
        keys, values = new_k, new_v
        s_max = keys.shape[1]
        rows = cursor + jnp.arange(t)[:, None]
        cols = jnp.arange(s_max)[None, :]
        mask = (cols <= rows)[None, None]                            # [1,1,T,S]

    if key_padding is not None:
        mask = mask & key_padding[:, None, None, :]

    out = attention(q, keys.astype(q.dtype), values.astype(q.dtype),
                    mask, scale=hd ** -0.5)
    return linear(layer["o"], out.reshape(b, t, -1)), new_k, new_v


def text_forward(
    params: dict,
    cfg: TextConfig,
    embeds: jax.Array,
    position_ids: jax.Array,
    cache: KVCache | None = None,
    key_padding: jax.Array | None = None,
) -> tuple[jax.Array, KVCache | None]:
    """Decoder stack over input embeddings.

    embeds: [B, T, D]; position_ids: [3, B, T];
    key_padding: optional bool [B, S] valid-key mask (S = cache len or T).
    Returns (hidden [B, T, D] after final norm, updated cache or None).
    """
    cos, sin = mrope_cos_sin(cfg, position_ids)
    x = embeds
    layers = params["layers"]

    def layer_step(x, layer, layer_cache):
        """One decoder layer; layer_cache = (k, v, cursor) or None."""
        attn_out, nk, nv = _self_attention(
            layer["attn"], cfg, rms_norm(layer["ln1"], x, cfg.rms_norm_eps),
            cos, sin, layer_cache, key_padding)
        x = x + attn_out
        x = x + swiglu_mlp(layer["mlp"],
                           rms_norm(layer["ln2"], x, cfg.rms_norm_eps))
        return x, nk, nv

    new_cache = None
    if isinstance(layers, dict):
        # Stacked layout: one scanned layer body (see models/paged.py) —
        # the per-layer cache slabs ride the scan as xs, updated slabs
        # come back stacked as ys.
        if cache is not None:
            def scan_body(x, xs):
                layer, ck, cv = xs
                x, nk, nv = layer_step(x, layer, (ck, cv, cache.cursor))
                return x, (nk, nv)

            x, (new_k, new_v) = jax.lax.scan(
                scan_body, x, (layers, cache.k, cache.v))
            new_cache = KVCache(k=new_k, v=new_v,
                                cursor=cache.cursor + embeds.shape[1])
        else:
            def scan_body(x, layer):
                x, _, _ = layer_step(x, layer, None)
                return x, None

            x, _ = jax.lax.scan(scan_body, x, layers)
    else:                                       # legacy per-layer list
        new_ks, new_vs = [], []
        for idx, layer in enumerate(layers):
            layer_cache = (None if cache is None
                           else (cache.k[idx], cache.v[idx], cache.cursor))
            x, nk, nv = layer_step(x, layer, layer_cache)
            if nk is not None:
                new_ks.append(nk)
                new_vs.append(nv)
        if cache is not None:
            new_cache = KVCache(k=jnp.stack(new_ks), v=jnp.stack(new_vs),
                                cursor=cache.cursor + embeds.shape[1])

    x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)
    return x, new_cache


def lm_logits(params: dict, cfg: TextConfig, hidden: jax.Array) -> jax.Array:
    """Project final hidden states to vocabulary logits (fp32).

    Supports the weight-only int8 head (models/quant.py): the widening is
    written inline so XLA fuses it into the matmul's HBM read (1 byte per
    weight — the head is the largest single weight read of a decode step),
    while accumulation and the per-column scale stay f32 so argmax
    decisions see bf16-path precision."""
    if cfg.tie_word_embeddings:
        w = params["embed"]["w"].T
    else:
        head = params["lm_head"]
        if "w_q" in head:
            b, t, d = hidden.shape
            from handwritten_ocr_tpu.ops.dispatch import (
                INT8_KERNEL_AUTO_BYTES, int8_kernel_mode)
            mode = int8_kernel_mode()
            use_kernel = (mode in ("compiled", "interpret")
                          or (mode == "auto"
                              and head["w_q"].size >= INT8_KERNEL_AUTO_BYTES))
            if use_kernel and b * t <= 32:
                # The 520 MB int8 head exceeds VMEM, so XLA streams it at
                # ~76% of HBM; the Pallas kernel's pipelined block DMAs
                # reach ~91% (−140 us/step at batch 24). f32 accumulate +
                # f32 scale in-kernel keep the argmax contract.
                from handwritten_ocr_tpu.ops.int8_matmul import int8_matmul
                out = int8_matmul(hidden.reshape(b * t, d), head["w_q"],
                                  head["w_scale"], out_dtype=jnp.float32,
                                  interpret=(mode == "interpret"))
                return out.reshape(b, t, -1)
            logits = jnp.einsum("btd,dv->btv", hidden,
                                head["w_q"].astype(hidden.dtype),
                                preferred_element_type=jnp.float32)
            return logits * head["w_scale"]
        w = head["w"]
    return jnp.einsum("btd,dv->btv", hidden, w, preferred_element_type=jnp.float32)
