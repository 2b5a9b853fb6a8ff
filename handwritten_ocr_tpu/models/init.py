"""Random parameter initialization (bench / dry-run / training-from-scratch).

Produces pytrees with exactly the converter's layout (models/weights.py) so
every code path — sharding specs, forward, train step — is identical for
random and checkpoint weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig, VisionConfig


def _split(key, n):
    return list(jax.random.split(key, n))


def stack_layers(layers: list) -> dict:
    """Stack identically-structured per-layer param dicts into one dict
    of ``[L, ...]`` arrays — the layout ``lax.scan`` consumes (one traced
    layer body instead of an L-times unrolled graph). int8 per-column
    scales stack to ``[L, out]``; per-layer slices are identical to the
    unstacked tree, so numerics are unchanged.

    Host numpy leaves (the checkpoint converter's path) stack ON HOST
    and transfer once — stacking them on device would briefly hold both
    the per-layer copies and the stacked copy in HBM (~2x the text
    tree), which is exactly the transient a 7B load cannot afford."""
    def _stack(*xs):
        if all(isinstance(x, np.ndarray) for x in xs):
            return jnp.asarray(np.stack(xs))
        return jnp.stack(xs)

    return jax.tree_util.tree_map(_stack, *layers)


def unstack_layers(stacked: dict) -> list:
    """Inverse of :func:`stack_layers` (debug / interop)."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(n)]


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


def _sync(x) -> None:
    """Force the device queue to drain through ``x`` (1-element fetch).
    jax.block_until_ready does NOT actually synchronize on the axon TPU
    tunnel, so without a fetch the whole init enqueues ahead of its
    frees and the transient staging collides with later programs."""
    np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1]))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _gen_stacked(key, n, d_in, d_out, quantize: bool, dtype_name: str,
                 scale: float = 0.02):
    """Generate a layer-stacked linear weight ``[n, d_in, d_out]`` with
    the f32 staging BOUNDED: a lax.map over layers generates + casts (or
    quantizes, per-column absmax exactly like quant._quantize_linear)
    one layer at a time inside the program's temp arena. One dispatch,
    no 2x-tree transient — building per-layer arrays then stacking
    doubled the whole 7B tree (~16 GB) and OOMed the next program."""
    keys = jax.random.split(key, n)

    def gen_one(k):
        w = jax.random.normal(k, (d_in, d_out), jnp.float32) * scale
        if quantize:
            absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
            s = jnp.maximum(absmax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
            return q, s[0]
        return w.astype(jnp.dtype(dtype_name)), jnp.zeros((1,), jnp.float32)

    return jax.lax.map(gen_one, keys)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _gen_wide(key, d_in, d_out, cols, quantize: bool, dtype_name: str,
              scale: float = 0.02):
    """Generate one wide 2D weight ``[d_in, d_out]`` in column chunks
    of ``cols`` via lax.map (bounded staging — the 7B lm_head is 2.2 GB
    in f32). Column chunking keeps per-column quantization scales exact.
    Requires cols to divide d_out."""
    n_chunks = d_out // cols
    keys = jax.random.split(key, n_chunks)

    def gen_one(k):
        w = jax.random.normal(k, (d_in, cols), jnp.float32) * scale
        if quantize:
            absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
            s = jnp.maximum(absmax, 1e-8) / 127.0
            q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
            return q, s[0]
        return w.astype(jnp.dtype(dtype_name)), jnp.zeros((1,), jnp.float32)

    w, s = jax.lax.map(gen_one, keys)           # [C, d_in, cols], [C, cols]
    return jnp.swapaxes(w, 0, 1).reshape(d_in, n_chunks * cols), s.reshape(-1)


def _wide_cols(d_in: int, d_out: int) -> int:
    """Largest column chunk that divides d_out with f32 staging <=
    ~0.4 GB (or d_out itself when it is already small)."""
    if d_in * d_out * 4 <= 400e6:
        return d_out
    target = max(1, int(400e6 // (d_in * 4)))
    for cols in range(min(target, d_out), 0, -1):
        if d_out % cols == 0:
            return cols
    return d_out


# Below this f32 staging size, generate a stacked/wide weight in one
# eager op — the jitted lax.map generators exist to bound staging for
# multi-GB 7B leaves, and their compiles would tax every tiny-config
# test (the CPU suite inits hundreds of tiny models).
_DIRECT_BYTES = 256e6


def _quantize_or_cast(w, quantize, dtype):
    if quantize:
        from handwritten_ocr_tpu.models.quant import _quantize_linear
        return _quantize_linear({"w": w})
    return {"w": w.astype(dtype)}


def _linear_stack(key, n, d_in, d_out, dtype, bias=False, scale=0.02,
                  quant_ok=True):
    """Layer-stacked linear init ``{w|w_q+w_scale} [n, d_in, d_out]``."""
    quantize = _QUANTIZE and quant_ok
    if n * d_in * d_out * 4 <= _DIRECT_BYTES:
        w = jax.random.normal(key, (n, d_in, d_out), jnp.float32) * scale
        params = _quantize_or_cast(w, quantize, dtype)
    else:
        w, s = _gen_stacked(key, n, d_in, d_out, quantize,
                            jnp.dtype(dtype).name, scale)
        params = ({"w_q": w, "w_scale": s} if quantize else {"w": w})
    if bias:
        params["b"] = jnp.zeros((n, d_out), dtype)
    return params


def _linear_wide(key, d_in, d_out, dtype, quant_ok=True):
    """One wide 2D linear (lm_head / embed scale) with bounded staging."""
    quantize = _QUANTIZE and quant_ok
    if d_in * d_out * 4 <= _DIRECT_BYTES:
        w = jax.random.normal(key, (d_in, d_out), jnp.float32) * 0.02
        return _quantize_or_cast(w, quantize, dtype)
    cols = _wide_cols(d_in, d_out)
    w, s = _gen_wide(key, d_in, d_out, cols, quantize, jnp.dtype(dtype).name)
    return ({"w_q": w, "w_scale": s} if quantize else {"w": w})


def _norm_stack(n, dim, dtype):
    return {"scale": jnp.ones((n, dim), dtype)}


def _mlp_stack(key, n, d, inter, dtype, bias=False):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"gate": _linear_stack(k1, n, d, inter, dtype, bias),
            "up": _linear_stack(k2, n, d, inter, dtype, bias),
            "down": _linear_stack(k3, n, inter, d, dtype, bias)}


def _norm(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype)}


def _mlp(key, d, inter, dtype, bias=False):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"gate": _linear(k1, d, inter, dtype, bias),
            "up": _linear(k2, d, inter, dtype, bias),
            "down": _linear(k3, inter, d, dtype, bias)}


def init_vision(key, cfg: VisionConfig, dtype=jnp.bfloat16) -> dict:
    keys = _split(key, 3)
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    n = cfg.depth
    k_qkv, k_proj, km = jax.random.split(keys[0], 3)
    blocks = {
        "norm1": _norm_stack(n, cfg.hidden_size, dtype),
        "norm2": _norm_stack(n, cfg.hidden_size, dtype),
        "attn": {
            "qkv": _linear_stack(k_qkv, n, cfg.hidden_size,
                                 3 * cfg.hidden_size, dtype, bias=True),
            "proj": _linear_stack(k_proj, n, cfg.hidden_size,
                                  cfg.hidden_size, dtype, bias=True),
        },
        "mlp": _mlp_stack(km, n, cfg.hidden_size, cfg.intermediate_size,
                          dtype, bias=True),
    }
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
    n = cfg.num_hidden_layers
    keys = _split(key, 3)
    hd = cfg.head_dim
    kq, kk, kv, ko, km = jax.random.split(keys[0], 5)
    attn = {
        "q": _linear_stack(kq, n, cfg.hidden_size,
                           cfg.num_attention_heads * hd, dtype,
                           bias=attn_bias),
        "k": _linear_stack(kk, n, cfg.hidden_size,
                           cfg.num_key_value_heads * hd, dtype,
                           bias=attn_bias),
        "v": _linear_stack(kv, n, cfg.hidden_size,
                           cfg.num_key_value_heads * hd, dtype,
                           bias=attn_bias),
        "o": _linear_stack(ko, n, cfg.num_attention_heads * hd,
                           cfg.hidden_size, dtype),
    }
    if qk_norm:
        attn["q_norm"] = _norm_stack(n, hd, dtype)
        attn["k_norm"] = _norm_stack(n, hd, dtype)
    layers = {
        "ln1": _norm_stack(n, cfg.hidden_size, dtype),
        "ln2": _norm_stack(n, cfg.hidden_size, dtype),
        "attn": attn,
        "mlp": _mlp_stack(km, n, cfg.hidden_size, cfg.intermediate_size,
                          dtype),
    }
    # Embed and lm_head are the two biggest single tensors (2.2 GB f32
    # staging each at 7B) — generate both with bounded staging.
    vocab, hidden = cfg.vocab_size, cfg.hidden_size
    if vocab * hidden * 4 <= _DIRECT_BYTES:
        emb = (jax.random.normal(keys[-1], (vocab, hidden), jnp.float32)
               * 0.02).astype(dtype)
    else:
        rows = _wide_cols(hidden, vocab)
        emb = _gen_stacked(keys[-1], vocab // rows, rows, hidden, False,
                           jnp.dtype(dtype).name)[0].reshape(vocab, hidden)
    tree = {
        "embed": {"w": emb},
        "layers": layers,
        "final_norm": _norm(cfg.hidden_size, dtype),
    }
    if not cfg.tie_word_embeddings:
        tree["lm_head"] = _linear_wide(keys[-2], hidden, vocab, dtype)
    _sync(tree["embed"])               # drain before the caller's programs
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
