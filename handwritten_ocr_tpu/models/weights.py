"""Checkpoint loading: HF safetensors / torch state_dicts → JAX pytrees.

Weight-layout conventions (models/layers.py): linear weights are stored
transposed ([in, out]) so forwards are ``x @ w``; embeddings stay [V, D].

Sources:
  * a directory of ``*.safetensors`` shards (production checkpoints, e.g.
    allenai/olmOCR-2-7B-1025 snapshot) — zero-copy numpy via safetensors;
  * an in-memory HF torch model's ``state_dict()`` (tiny-config parity
    tests, weight-identical by construction).
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu.models.init import stack_layers


def _to_numpy(tensor) -> np.ndarray:
    if isinstance(tensor, np.ndarray):
        return tensor
    # torch tensor (incl. bfloat16 → fp32 roundtrip-safe upcast)
    try:
        import torch
        if tensor.dtype == torch.bfloat16:
            return tensor.detach().to(torch.float32).cpu().numpy()
        return tensor.detach().cpu().numpy()
    except ImportError:  # pragma: no cover
        raise TypeError(f"unsupported tensor type {type(tensor)}")


def load_flat_state(source) -> dict[str, np.ndarray]:
    """Flat name→array dict from a dir of safetensors or a state_dict."""
    if isinstance(source, (str, Path)):
        from safetensors.numpy import load_file
        shards = sorted(Path(source).glob("*.safetensors"))
        if not shards:
            raise FileNotFoundError(f"no .safetensors files under {source}")
        flat: dict[str, np.ndarray] = {}
        for shard in shards:
            flat.update(load_file(str(shard)))
        return flat
    if isinstance(source, Mapping):
        return {k: _to_numpy(v) for k, v in source.items()}
    # torch nn.Module
    return {k: _to_numpy(v) for k, v in source.state_dict().items()}


class _Namer:
    """Resolves HF param names with an optional prefix fallback.

    Different checkpoint eras use ``model.language_model.*`` vs ``model.*``
    and ``model.visual.*`` vs ``visual.*``; try each candidate prefix.
    """

    def __init__(self, flat: dict[str, np.ndarray], prefixes: list[str]):
        self.flat = flat
        self.prefixes = prefixes
        self.used: set[str] = set()

    def get(self, name: str) -> np.ndarray:
        for prefix in self.prefixes:
            key = prefix + name
            if key in self.flat:
                self.used.add(key)
                return self.flat[key]
        raise KeyError(f"{name} (tried prefixes {self.prefixes})")

    def has(self, name: str) -> bool:
        return any(prefix + name in self.flat for prefix in self.prefixes)


def _linear(namer: _Namer, name: str, dtype) -> dict:
    # Host-side numpy leaves: stack_layers np.stacks per-layer lists on
    # host and ships ONE stacked leaf to device, so the per-layer copies
    # never hold HBM (the jnp-leaf path kept a ~2x text-tree transient
    # on the conversion device — round-4 advisor finding). The final
    # tree_map(jnp.asarray) in the converters places everything.
    np_dtype = np.dtype(dtype)
    params = {"w": namer.get(f"{name}.weight").T.astype(np_dtype)}
    if namer.has(f"{name}.bias"):
        params["b"] = namer.get(f"{name}.bias").astype(np_dtype)
    return params


def _norm(namer: _Namer, name: str, dtype) -> dict:
    return {"scale": namer.get(f"{name}.weight").astype(np.dtype(dtype))}


def _mlp(namer: _Namer, base: str, dtype) -> dict:
    return {
        "gate": _linear(namer, f"{base}.gate_proj", dtype),
        "up": _linear(namer, f"{base}.up_proj", dtype),
        "down": _linear(namer, f"{base}.down_proj", dtype),
    }


def convert_vl(source, vl_config, dtype=jnp.bfloat16) -> dict:
    """Qwen2.5-VL checkpoint → {"vision": ..., "text": ...} pytree."""
    flat = load_flat_state(source)
    vis = _Namer(flat, ["model.visual.", "visual."])
    txt = _Namer(flat, ["model.language_model.", "model.", "language_model."])

    patch_w = vis.get("patch_embed.proj.weight")           # (D, C, T, ps, ps)
    vision = {
        "patch_embed": {"w": jnp.asarray(
            patch_w.reshape(patch_w.shape[0], -1).T, dtype)},
        "blocks": stack_layers([
            {
                "norm1": _norm(vis, f"blocks.{i}.norm1", dtype),
                "norm2": _norm(vis, f"blocks.{i}.norm2", dtype),
                "attn": {
                    "qkv": _linear(vis, f"blocks.{i}.attn.qkv", dtype),
                    "proj": _linear(vis, f"blocks.{i}.attn.proj", dtype),
                },
                "mlp": _mlp(vis, f"blocks.{i}.mlp", dtype),
            }
            for i in range(vl_config.vision.depth)
        ]),
        "merger": {
            "ln_q": _norm(vis, "merger.ln_q", dtype),
            "fc1": _linear(vis, "merger.mlp.0", dtype),
            "fc2": _linear(vis, "merger.mlp.2", dtype),
        },
    }

    text = _text_tree(txt, vl_config.text.num_hidden_layers, dtype,
                      qk_norm=False)
    if not vl_config.text.tie_word_embeddings:
        head = _Namer(flat, ["", "model."])
        text["lm_head"] = _linear(head, "lm_head", dtype)
    # Single host→device transfer per leaf (no-op on already-jnp leaves).
    return jax.tree_util.tree_map(jnp.asarray,
                                  {"vision": vision, "text": text})


def convert_qwen3(source, config, dtype=jnp.bfloat16) -> dict:
    """Qwen3 causal-LM checkpoint → text pytree (with per-head QK norms)."""
    flat = load_flat_state(source)
    txt = _Namer(flat, ["model.", ""])
    text = _text_tree(txt, config.num_hidden_layers, dtype, qk_norm=True)
    if not config.tie_word_embeddings:
        head = _Namer(flat, ["", "model."])
        text["lm_head"] = _linear(head, "lm_head", dtype)
    return jax.tree_util.tree_map(jnp.asarray, text)


def _text_tree(txt: _Namer, num_layers: int, dtype, qk_norm: bool) -> dict:
    layers = []
    for i in range(num_layers):
        base = f"layers.{i}"
        attn = {
            "q": _linear(txt, f"{base}.self_attn.q_proj", dtype),
            "k": _linear(txt, f"{base}.self_attn.k_proj", dtype),
            "v": _linear(txt, f"{base}.self_attn.v_proj", dtype),
            "o": _linear(txt, f"{base}.self_attn.o_proj", dtype),
        }
        if qk_norm:
            attn["q_norm"] = _norm(txt, f"{base}.self_attn.q_norm", dtype)
            attn["k_norm"] = _norm(txt, f"{base}.self_attn.k_norm", dtype)
        layers.append({
            "ln1": _norm(txt, f"{base}.input_layernorm", dtype),
            "ln2": _norm(txt, f"{base}.post_attention_layernorm", dtype),
            "attn": attn,
            "mlp": _mlp(txt, f"{base}.mlp", dtype),
        })
    return {
        "embed": {"w": txt.get("embed_tokens.weight").astype(np.dtype(dtype))},
        "layers": stack_layers(layers),
        "final_norm": _norm(txt, "norm", dtype),
    }
