"""Random parameter initialization (bench / dry-run / training-from-scratch).

Produces pytrees with exactly the converter's layout (models/weights.py) so
every code path — sharding specs, forward, train step — is identical for
random and checkpoint weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig, VisionConfig


def _split(key, n):
    return list(jax.random.split(key, n))


_QUANTIZE = False  # module-level switch set by init_vl(quantize=...)


def _linear(key, d_in, d_out, dtype, bias=False, scale=0.02, quant_ok=True):
    kw, kb = jax.random.split(key)
    w = (jax.random.normal(kw, (d_in, d_out), jnp.float32) * scale)
    if _QUANTIZE and quant_ok:
        # Quantize immediately so the full-precision tree never
        # materializes (a bf16 7B tree alone would exhaust a 16 GB chip).
        # Layout matches models/quant.quantize_tree (projections +
        # lm_head; the patch_embed caller passes quant_ok=False).
        from handwritten_ocr_tpu.models.quant import _quantize_linear
        params = _quantize_linear({"w": w})
    else:
        params = {"w": w.astype(dtype)}
    if bias:
        params["b"] = jnp.zeros((d_out,), dtype)
    return params


def _norm(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype)}


def _mlp(key, d, inter, dtype, bias=False):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"gate": _linear(k1, d, inter, dtype, bias),
            "up": _linear(k2, d, inter, dtype, bias),
            "down": _linear(k3, inter, d, dtype, bias)}


def init_vision(key, cfg: VisionConfig, dtype=jnp.bfloat16) -> dict:
    keys = _split(key, cfg.depth + 2)
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    blocks = []
    for i in range(cfg.depth):
        ka, km = jax.random.split(keys[i])
        k_qkv, k_proj = jax.random.split(ka)
        blocks.append({
            "norm1": _norm(cfg.hidden_size, dtype),
            "norm2": _norm(cfg.hidden_size, dtype),
            "attn": {
                "qkv": _linear(k_qkv, cfg.hidden_size, 3 * cfg.hidden_size,
                               dtype, bias=True),
                "proj": _linear(k_proj, cfg.hidden_size, cfg.hidden_size,
                                dtype, bias=True),
            },
            "mlp": _mlp(km, cfg.hidden_size, cfg.intermediate_size, dtype,
                        bias=True),
        })
    k_m1, k_m2 = jax.random.split(keys[-1])
    merged = cfg.hidden_size * cfg.spatial_merge_unit
    return {
        "patch_embed": _linear(keys[-2], patch_dim, cfg.hidden_size, dtype,
                               quant_ok=False),
        "blocks": blocks,
        "merger": {
            "ln_q": _norm(cfg.hidden_size, dtype),
            "fc1": _linear(k_m1, merged, merged, dtype, bias=True),
            "fc2": _linear(k_m2, merged, cfg.out_hidden_size, dtype, bias=True),
        },
    }


def init_text(key, cfg, dtype=jnp.bfloat16, qk_norm: bool = False,
              attn_bias: bool = True) -> dict:
    n_layers = cfg.num_hidden_layers
    keys = _split(key, n_layers + 3)
    hd = cfg.head_dim
    layers = []
    for i in range(n_layers):
        kq, kk, kv, ko, km = jax.random.split(keys[i], 5)
        attn = {
            "q": _linear(kq, cfg.hidden_size, cfg.num_attention_heads * hd,
                         dtype, bias=attn_bias),
            "k": _linear(kk, cfg.hidden_size, cfg.num_key_value_heads * hd,
                         dtype, bias=attn_bias),
            "v": _linear(kv, cfg.hidden_size, cfg.num_key_value_heads * hd,
                         dtype, bias=attn_bias),
            "o": _linear(ko, cfg.num_attention_heads * hd, cfg.hidden_size,
                         dtype),
        }
        if qk_norm:
            attn["q_norm"] = _norm(hd, dtype)
            attn["k_norm"] = _norm(hd, dtype)
        layers.append({
            "ln1": _norm(cfg.hidden_size, dtype),
            "ln2": _norm(cfg.hidden_size, dtype),
            "attn": attn,
            "mlp": _mlp(km, cfg.hidden_size, cfg.intermediate_size, dtype),
        })
    tree = {
        "embed": {"w": (jax.random.normal(
            keys[-1], (cfg.vocab_size, cfg.hidden_size), jnp.float32)
            * 0.02).astype(dtype)},
        "layers": layers,
        "final_norm": _norm(cfg.hidden_size, dtype),
    }
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = _linear(keys[-2], cfg.hidden_size, cfg.vocab_size,
                                  dtype)
    return tree


def init_qwen3(key, cfg, dtype=jnp.bfloat16,
               quantize: str | None = None) -> dict:
    """Random Qwen3 params (QK-norm, no attention biases) in the
    converter's layout (models/weights.py:convert_qwen3)."""
    global _QUANTIZE
    _QUANTIZE = quantize == "int8"
    try:
        return init_text(key, cfg, dtype, qk_norm=True, attn_bias=False)
    finally:
        _QUANTIZE = False


def init_vl(key, cfg: VLConfig, dtype=jnp.bfloat16,
            quantize: str | None = None) -> dict:
    """Random VL params; ``quantize='int8'`` builds projections directly
    as int8 (layout identical to models/quant.quantize_tree output)."""
    global _QUANTIZE
    _QUANTIZE = quantize == "int8"
    try:
        kv, kt = jax.random.split(key)
        return {"vision": init_vision(kv, cfg.vision, dtype),
                "text": init_text(kt, cfg.text, dtype, qk_norm=False,
                                  attn_bias=True)}
    finally:
        _QUANTIZE = False
