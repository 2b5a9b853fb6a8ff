"""Weight-only int8 quantization (per-output-channel absmax).

Halves HBM weight traffic — the decode step is weight-bandwidth-bound
(measured ~94% of speed-of-light in bf16), so int8 weights approach a 2x
decode speedup and let the 7B flagship fit a single 16 GB chip.

Scheme: every projection weight W[in, out] in the attention/MLP stacks —
and the lm_head, which at 152k vocab is the single largest per-step weight
read (1.09 GB bf16 for the 7B) — is stored as int8 with a float32
per-column scale (absmax / 127). Embedding, norms, and biases stay in bf16
(quality-critical, small share of bytes; the embed table is a row gather,
not a full read, so quantizing it buys no decode bandwidth). The forward
dequantizes inline: ``(x @ W_q.astype(bf16)) * scale`` — XLA keeps the
int8 buffer in HBM and fuses the widening into the matmul read on TPU.
The lm_head matmul accumulates in f32 and applies its scale in f32
(models/qwen25vl/language.py:lm_logits), so argmax decisions see the same
precision as the bf16 path.

Quality: weight-only int8 with per-channel scales is a standard deployment
scheme with near-lossless greedy-decode behavior; parity bounds are checked
in tests (tiny models, logits drift and token agreement).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# Leaf dict keys of projections to quantize (matches weights.py layout).
_QUANT_PARENTS = {"q", "k", "v", "o", "qkv", "proj", "gate", "up", "down",
                  "fc1", "fc2", "lm_head"}


def _quantize_linear(linear_params: dict) -> dict:
    """Per-output-channel absmax quantization of ``w [in, out]`` or a
    layer-stacked ``w [L, in, out]`` (scales stay per layer per column —
    bit-identical to quantizing each layer separately)."""
    w = linear_params["w"].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)    # [..., 1, out]
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q,
           "w_scale": jnp.squeeze(scale, axis=-2).astype(jnp.float32)}
    if "b" in linear_params:
        out["b"] = linear_params["b"]
    return out


def quantize_tree(params: Any, lm_head: bool = True) -> Any:
    """Quantize every projection in a param pytree (dict/list recursion).

    ``lm_head=False`` keeps the output head in bf16 (the pre-round-2
    policy) for A/B comparisons."""
    if isinstance(params, dict):
        out = {}
        for key, value in params.items():
            quantizable = key in _QUANT_PARENTS and (key != "lm_head"
                                                     or lm_head)
            if (isinstance(value, dict) and quantizable
                    and "w" in value and value["w"].ndim in (2, 3)):
                out[key] = _quantize_linear(value)
            else:
                out[key] = quantize_tree(value, lm_head=lm_head)
        return out
    if isinstance(params, list):
        return [quantize_tree(v, lm_head=lm_head) for v in params]
    return params


def dequantize_weight(linear_params: dict, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the bf16 weight (debug/inspection only)."""
    return (linear_params["w_q"].astype(jnp.float32)
            * linear_params["w_scale"]).astype(dtype)


def quantized_bytes(params: Any) -> int:
    """Total parameter bytes after quantization (reporting helper)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(leaf.size * leaf.dtype.itemsize for leaf in leaves)
