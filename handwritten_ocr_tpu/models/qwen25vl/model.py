"""Full Qwen2.5-VL model: vision splice, M-RoPE indexing, greedy decode.

TPU-first decode design: one jitted prefill (image encode + prompt pass,
static shapes per grid/prompt-length bucket) and one jitted single-token
decode step driven by ``lax.while_loop`` — the whole generation runs
on-device; the host only sees the final token buffer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig
from handwritten_ocr_tpu.models.qwen25vl.language import (
    KVCache,
    lm_logits,
    text_forward,
)
from handwritten_ocr_tpu.models.qwen25vl.vision import vision_encode


def rope_index_for_prompt(
    ids: np.ndarray,
    config: VLConfig,
    image_grids: list[tuple[int, int, int]],
) -> tuple[np.ndarray, int]:
    """M-RoPE position ids for one prompt row (host-side, numpy).

    Semantics follow HF ``get_rope_index`` (modeling_qwen2_5_vl.py:956-1139)
    for image-only inputs: text spans advance all three planes together;
    each image span gets (t, h, w) grid coordinates offset to continue after
    the preceding text. Returns ([3, T] positions, rope_delta).
    """
    ids = np.asarray(ids)
    total = len(ids)
    positions = np.zeros((3, total), dtype=np.int64)
    image_positions = np.flatnonzero(ids == config.image_token_id)

    # Group contiguous image-token runs (one run per image).
    runs: list[tuple[int, int]] = []
    if len(image_positions):
        breaks = np.flatnonzero(np.diff(image_positions) > 1)
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [len(image_positions) - 1]))
        runs = [(int(image_positions[a]), int(image_positions[z]) + 1)
                for a, z in zip(starts, ends)]
    assert len(runs) == len(image_grids), (
        f"{len(runs)} image-token runs vs {len(image_grids)} grids")

    cursor = 0       # index into ids
    next_pos = 0     # next position value
    for (start, end), (t, h, w) in zip(runs, image_grids):
        merge = config.vision.spatial_merge_size
        gh, gw = h // merge, w // merge
        text_len = start - cursor
        positions[:, cursor:start] = next_pos + np.arange(text_len)
        next_pos += text_len
        t_idx = np.repeat(np.zeros(t, dtype=np.int64), gh * gw)  # images: t=0
        h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
        w_idx = np.tile(np.tile(np.arange(gw), gh), t)
        positions[0, start:end] = next_pos + t_idx
        positions[1, start:end] = next_pos + h_idx
        positions[2, start:end] = next_pos + w_idx
        next_pos = positions[:, start:end].max() + 1
        cursor = end
    tail = total - cursor
    positions[:, cursor:] = next_pos + np.arange(tail)

    delta = int(positions.max()) + 1 - total
    return positions, delta


class GenerationResult(NamedTuple):
    tokens: jax.Array    # [B, max_new] generated ids (pad after eos)
    lengths: jax.Array   # [B] number of valid generated tokens


class VLModel:
    """Inference wrapper: params + config + jitted prefill/decode."""

    def __init__(self, params: dict, config: VLConfig):
        self.params = params
        self.config = config

    # ── jitted stages ─────────────────────────────────────────────
    def _spliced_embeds(self, params, input_ids, patches, grid):
        """Prompt embeddings with vision features spliced at image tokens."""
        cfg = self.config
        embeds = params["text"]["embed"]["w"][input_ids]
        if patches is not None:
            image_embeds = vision_encode(params["vision"], cfg.vision, patches, grid)
            image_embeds = image_embeds.astype(embeds.dtype)
            image_mask = (input_ids == cfg.image_token_id)[..., None]
            # One image per row with identical spans: place row-r embeddings
            # at the masked positions via cumulative indexing.
            slot = jnp.cumsum(image_mask[..., 0], axis=1) - 1
            slot = jnp.clip(slot, 0, image_embeds.shape[1] - 1)
            gathered = jnp.take_along_axis(image_embeds, slot[..., None], axis=1)
            embeds = jnp.where(image_mask, gathered, embeds)
        return embeds

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _vision_embeds(self, params, patches, grid):
        from handwritten_ocr_tpu.config import SERVE_VISION_CHUNK
        batch = patches.shape[0]
        chunk = max(1, SERVE_VISION_CHUNK)
        if batch <= chunk:
            return vision_encode(params["vision"], self.config.vision,
                                 patches, grid)
        # Wide batches encode in sequential page chunks (lax.map): the
        # tower is compute-bound, so this costs ~nothing but caps the
        # program's temp arena at one chunk's activations — batch 24
        # peaked ~2.3 GB in one dispatch, past the chip's usable HBM
        # next to the int8 7B params and the KV pools.
        pad = (-batch) % chunk
        if pad:
            patches = jnp.concatenate([patches, patches[:pad]], axis=0)
        stacked = patches.reshape(-1, chunk, *patches.shape[1:])
        out = jax.lax.map(
            lambda block: vision_encode(params["vision"],
                                        self.config.vision, block, grid),
            stacked)
        return out.reshape(-1, *out.shape[2:])[:batch]

    @functools.partial(jax.jit, static_argnums=(0,))
    def _splice_embeds(self, params, input_ids, image_embeds):
        cfg = self.config
        embeds = params["text"]["embed"]["w"][input_ids]
        image_embeds = image_embeds.astype(embeds.dtype)
        image_mask = (input_ids == cfg.image_token_id)[..., None]
        slot = jnp.cumsum(image_mask[..., 0], axis=1) - 1
        slot = jnp.clip(slot, 0, image_embeds.shape[1] - 1)
        gathered = jnp.take_along_axis(image_embeds, slot[..., None], axis=1)
        return jnp.where(image_mask, gathered, embeds)

    def prompt_embeds(self, params, input_ids, patches, grid):
        """Vision encode + splice (the paged-serving prefill input).

        Two dispatches on purpose: the flagship vision program's
        workspace at batch 24 sits near the HBM edge next to the int8
        params + KV pools; keeping the embed-lookup/splice buffers out
        of the same program (their peaks don't stack) is ~0.7 GB of
        headroom at the bench grid."""
        image_embeds = self._vision_embeds(params, patches, grid)
        return self._splice_embeds(params, input_ids, image_embeds)

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def _prefill(self, params, input_ids, patches, grid, max_new, position_ids):
        cfg = self.config
        embeds = self._spliced_embeds(params, input_ids, patches, grid)
        batch, prompt_len = input_ids.shape
        cache = KVCache.zeros(
            cfg.text.num_hidden_layers, batch, prompt_len + max_new,
            cfg.text.num_key_value_heads, cfg.text.head_dim,
            dtype=embeds.dtype)
        hidden, cache = text_forward(params["text"], cfg.text, embeds,
                                     position_ids, cache)
        logits = lm_logits(params["text"], cfg.text, hidden[:, -1:])
        first_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return first_token, cache

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _decode(self, params, max_new, first_token, cache, rope_delta):
        cfg = self.config
        batch = first_token.shape[0]
        eos = cfg.eos_token_id

        tokens0 = jnp.zeros((batch, max_new), jnp.int32)
        tokens0 = tokens0.at[:, 0].set(first_token)
        done0 = first_token == eos

        def cond(state):
            step, _, _, done = state
            return (step < max_new) & ~jnp.all(done)

        def body(state):
            step, tokens, cache, done = state
            current = tokens[:, step - 1]
            embeds = params["text"]["embed"]["w"][current][:, None, :]
            pos = cache.cursor + rope_delta
            position_ids = jnp.broadcast_to(pos, (3, batch, 1))
            hidden, cache = text_forward(params["text"], cfg.text, embeds,
                                         position_ids, cache)
            logits = lm_logits(params["text"], cfg.text, hidden)
            next_token = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            next_token = jnp.where(done, eos, next_token)
            tokens = tokens.at[:, step].set(next_token)
            done = done | (next_token == eos)
            return step + 1, tokens, cache, done

        _, tokens, _, done = jax.lax.while_loop(
            cond, body, (jnp.int32(1), tokens0, cache, done0))

        not_eos = tokens != eos
        lengths = jnp.sum(jnp.cumprod(not_eos, axis=1), axis=1)
        # include the eos-terminated prefix semantics: tokens after first eos
        # are eos-padded by construction.
        return GenerationResult(tokens=tokens, lengths=lengths)

    # ── public API ────────────────────────────────────────────────
    def generate(
        self,
        input_ids: np.ndarray,
        patches: jax.Array | None,
        grid: tuple[int, int, int] | None,
        max_new_tokens: int,
    ) -> GenerationResult:
        """Greedy decode. All batch rows must share one prompt layout
        (identical token sequence structure — the batched-strategies case).
        """
        input_ids = np.asarray(input_ids, dtype=np.int32)
        grids = [tuple(int(g) for g in grid)] if grid is not None else []
        positions_row, delta = rope_index_for_prompt(
            input_ids[0], self.config, grids)
        batch = input_ids.shape[0]
        position_ids = jnp.asarray(
            np.broadcast_to(positions_row[:, None, :],
                            (3, batch, input_ids.shape[1])))

        first, cache = self._prefill(
            self.params, jnp.asarray(input_ids), patches,
            grids[0] if grids else None, int(max_new_tokens), position_ids)
        return self._decode(self.params, int(max_new_tokens), first, cache,
                            jnp.int32(delta))

    def forward_logits(
        self,
        input_ids: np.ndarray,
        patches: jax.Array | None = None,
        grid: tuple[int, int, int] | None = None,
    ) -> jax.Array:
        """Full-sequence logits without caching (parity tests)."""
        cfg = self.config
        input_ids = np.asarray(input_ids, dtype=np.int32)
        grids = [tuple(int(g) for g in grid)] if grid is not None else []
        positions_row, _ = rope_index_for_prompt(input_ids[0], cfg, grids)
        batch, seq = input_ids.shape
        position_ids = jnp.asarray(
            np.broadcast_to(positions_row[:, None, :], (3, batch, seq)))

        ids = jnp.asarray(input_ids)
        embeds = self.params["text"]["embed"]["w"][ids]
        if patches is not None:
            image_embeds = vision_encode(self.params["vision"], cfg.vision,
                                         patches, grids[0]).astype(embeds.dtype)
            image_mask = (ids == cfg.image_token_id)[..., None]
            slot = jnp.clip(jnp.cumsum(image_mask[..., 0], axis=1) - 1, 0,
                            image_embeds.shape[1] - 1)
            gathered = jnp.take_along_axis(image_embeds, slot[..., None], axis=1)
            embeds = jnp.where(image_mask, gathered, embeds)
        hidden, _ = text_forward(self.params["text"], cfg.text, embeds,
                                 position_ids, cache=None)
        return lm_logits(self.params["text"], cfg.text, hidden)
