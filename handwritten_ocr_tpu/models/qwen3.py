"""Qwen3 text decoder in JAX (the reasoning engine architecture).

Qwen3 = Qwen2-style GQA decoder with per-head-dim RMSNorm on Q and K before
rotary, no attention biases, explicit head_dim, standard 1D RoPE. Reuses the
decoder stack in :mod:`handwritten_ocr_tpu.models.qwen25vl.language` (the
QK-norm branch activates on the presence of q_norm/k_norm params).
"""

from __future__ import annotations

import dataclasses
import functools
import json
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu.models.qwen25vl.language import (
    KVCache,
    lm_logits,
    text_forward,
)


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 5120
    intermediate_size: int = 25600
    num_hidden_layers: int = 64
    num_attention_heads: int = 64
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = False
    eos_token_id: int = 151645
    pad_token_id: int = 151643
    # 1D RoPE marker consumed by mrope_cos_sin (2D position ids path).
    mrope_section = None

    @classmethod
    def from_hf(cls, cfg: dict) -> "Qwen3Config":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in cfg.items() if k in known}
        eos = kwargs.get("eos_token_id", 151645)
        if isinstance(eos, list):
            eos = eos[0]
        kwargs["eos_token_id"] = 151645 if eos is None else eos
        if kwargs.get("pad_token_id") is None:
            kwargs.pop("pad_token_id", None)
        return cls(**kwargs)

    @classmethod
    def from_pretrained_dir(cls, model_dir: str | Path) -> "Qwen3Config":
        return cls.from_hf(json.loads((Path(model_dir) / "config.json").read_text()))


class GenerationResult(NamedTuple):
    tokens: jax.Array
    lengths: jax.Array


class Qwen3Model:
    """Greedy-decoding inference wrapper for Qwen3."""

    def __init__(self, params: dict, config: Qwen3Config):
        self.params = params
        self.config = config

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _prefill(self, params, input_ids, max_new, key_padding):
        cfg = self.config
        batch, prompt_len = input_ids.shape
        embeds = params["embed"]["w"][input_ids]
        position_ids = jnp.broadcast_to(jnp.arange(prompt_len)[None],
                                        (batch, prompt_len))
        if key_padding is not None:
            # Left-padded prompts: positions start at 0 on the first real token.
            offsets = jnp.argmax(key_padding, axis=1)[:, None]
            position_ids = jnp.maximum(position_ids - offsets, 0)
        cache = KVCache.zeros(cfg.num_hidden_layers, batch,
                              prompt_len + max_new, cfg.num_key_value_heads,
                              cfg.head_dim, dtype=embeds.dtype)
        hidden, cache = text_forward(params, cfg, embeds, position_ids, cache,
                                     key_padding=_pad_to_cache(key_padding, prompt_len + max_new))
        logits = lm_logits(params, cfg, hidden[:, -1:])
        first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return first, cache, position_ids[:, -1]

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _decode(self, params, max_new, first_token, cache, last_pos, key_padding):
        cfg = self.config
        batch = first_token.shape[0]
        eos = cfg.eos_token_id

        tokens0 = jnp.zeros((batch, max_new), jnp.int32).at[:, 0].set(first_token)
        done0 = first_token == eos
        padding = _pad_to_cache(key_padding, cache.k.shape[2])

        def cond(state):
            step, _, _, done = state
            return (step < max_new) & ~jnp.all(done)

        def body(state):
            step, tokens, cache, done = state
            current = tokens[:, step - 1]
            embeds = params["embed"]["w"][current][:, None, :]
            position_ids = (last_pos + step)[:, None]
            hidden, cache = text_forward(params, cfg, embeds, position_ids,
                                         cache, key_padding=padding)
            logits = lm_logits(params, cfg, hidden)
            next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            next_token = jnp.where(done, eos, next_token)
            tokens = tokens.at[:, step].set(next_token)
            return step + 1, tokens, cache, done | (next_token == eos)

        _, tokens, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(1), tokens0, cache, done0))
        lengths = jnp.sum(jnp.cumprod(tokens != eos, axis=1), axis=1)
        return GenerationResult(tokens=tokens, lengths=lengths)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _prefill_topk(self, params, input_ids, max_new, k):
        """Prefill returning the top-k next-token candidates (B=1)."""
        cfg = self.config
        batch, prompt_len = input_ids.shape
        embeds = params["embed"]["w"][input_ids]
        position_ids = jnp.broadcast_to(jnp.arange(prompt_len)[None],
                                        (batch, prompt_len))
        cache = KVCache.zeros(cfg.num_hidden_layers, batch,
                              prompt_len + max_new, cfg.num_key_value_heads,
                              cfg.head_dim, dtype=embeds.dtype)
        hidden, cache = text_forward(params, cfg, embeds, position_ids, cache)
        logits = lm_logits(params, cfg, hidden[:, -1:])[:, -1]
        values, idx = jax.lax.top_k(logits, k)
        return values, idx, cache

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _step_topk(self, params, token, cache, k, position):
        """One decode step returning top-k candidates (B=1)."""
        cfg = self.config
        embeds = params["embed"]["w"][token][:, None, :]
        hidden, cache = text_forward(params, cfg, embeds,
                                     position[:, None], cache)
        logits = lm_logits(params, cfg, hidden)[:, -1]
        values, idx = jax.lax.top_k(logits, k)
        return values, idx, cache

    def generate_json(self, input_ids: np.ndarray, max_new_tokens: int,
                      tokenizer, top_k: int = 64) -> str:
        """Grammar-constrained greedy decode: the output is valid JSON.

        Host-guided: each step takes the device's top-k candidates and
        commits the highest-scoring token whose decoded extension is still
        a viable JSON prefix (utils/json_guard); decoding stops as soon as
        the document completes. Replaces the reference's reliance on
        Ollama's server-side ``format=`` grammar constraint (tools.py:273).
        """
        from handwritten_ocr_tpu.utils.json_guard import is_complete, is_viable_prefix

        ids = jnp.asarray(np.asarray(input_ids, dtype=np.int32))
        assert ids.shape[0] == 1, "constrained decode is B=1"
        eos = self.config.eos_token_id

        _, idx, cache = self._prefill_topk(self.params, ids,
                                           int(max_new_tokens), top_k)
        prompt_len = ids.shape[1]
        generated: list[int] = []
        text = ""
        for step in range(max_new_tokens):
            candidates = np.asarray(idx)[0]
            chosen = None
            for token in candidates:
                token = int(token)
                if token == eos:
                    if is_complete(text):
                        return text
                    continue
                candidate_text = tokenizer.decode(generated + [token])
                probe = candidate_text.rstrip("�")
                if is_viable_prefix(probe):
                    chosen = token
                    text = candidate_text
                    break
            if chosen is None:
                break  # no viable continuation; caller's ladder salvages
            generated.append(chosen)
            if "�" not in text and is_complete(text):
                return text
            position = jnp.full((1,), prompt_len + step, jnp.int32)
            _, idx, cache = self._step_topk(
                self.params, jnp.asarray([chosen], jnp.int32), cache,
                top_k, position)
        return text

    def generate(self, input_ids: np.ndarray, max_new_tokens: int,
                 pad_mask: np.ndarray | None = None) -> GenerationResult:
        """Greedy decode; ``pad_mask`` True on real (non-pad) prompt tokens."""
        ids = jnp.asarray(np.asarray(input_ids, dtype=np.int32))
        padding = None if pad_mask is None else jnp.asarray(pad_mask, bool)
        first, cache, last_pos = self._prefill(self.params, ids,
                                               int(max_new_tokens), padding)
        return self._decode(self.params, int(max_new_tokens), first, cache,
                            last_pos, padding)

    def forward_logits(self, input_ids: np.ndarray) -> jax.Array:
        """Full-sequence logits without caching (parity tests)."""
        cfg = self.config
        ids = jnp.asarray(np.asarray(input_ids, dtype=np.int32))
        batch, seq = ids.shape
        embeds = self.params["embed"]["w"][ids]
        position_ids = jnp.broadcast_to(jnp.arange(seq)[None], (batch, seq))
        hidden, _ = text_forward(self.params, cfg, embeds, position_ids, None)
        return lm_logits(self.params, cfg, hidden)


def _pad_to_cache(key_padding: jax.Array | None, cache_len: int):
    """Extend a prompt-length padding mask to cache length (new slots valid)."""
    if key_padding is None:
        return None
    batch, prompt_len = key_padding.shape
    extra = jnp.ones((batch, cache_len - prompt_len), bool)
    return jnp.concatenate([key_padding, extra], axis=1)
