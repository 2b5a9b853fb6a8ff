"""Sharded VLM training step (fine-tuning on transcription targets)."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig
from handwritten_ocr_tpu.models.qwen25vl.language import lm_logits, text_forward
from handwritten_ocr_tpu.models.qwen25vl.vision import vision_encode


class TrainBatch(NamedTuple):
    input_ids: jax.Array      # [B, T] int32 (prompt + target tokens)
    patches: jax.Array        # [B, S, patch_dim]
    position_ids: jax.Array   # [3, B, T] M-RoPE positions
    loss_mask: jax.Array      # [B, T] float: 1 on target (response) tokens


def vl_forward(params: dict, cfg: VLConfig, input_ids: jax.Array,
               patches: jax.Array | None, grid: tuple[int, int, int] | None,
               position_ids: jax.Array) -> jax.Array:
    """Pure full-sequence forward → vocab logits [B, T, V]."""
    embeds = params["text"]["embed"]["w"][input_ids]
    if patches is not None:
        image_embeds = vision_encode(params["vision"], cfg.vision, patches,
                                     grid).astype(embeds.dtype)
        image_mask = (input_ids == cfg.image_token_id)[..., None]
        slot = jnp.clip(jnp.cumsum(image_mask[..., 0], axis=1) - 1, 0,
                        image_embeds.shape[1] - 1)
        gathered = jnp.take_along_axis(image_embeds, slot[..., None], axis=1)
        embeds = jnp.where(image_mask, gathered, embeds)
    hidden, _ = text_forward(params["text"], cfg.text, embeds, position_ids)
    return lm_logits(params["text"], cfg.text, hidden)


def next_token_loss(params: dict, cfg: VLConfig,
                    batch: TrainBatch, grid) -> jax.Array:
    """Masked next-token cross-entropy (mean over target tokens)."""
    logits = vl_forward(params, cfg, batch.input_ids, batch.patches, grid,
                        batch.position_ids)
    targets = batch.input_ids[:, 1:]
    mask = batch.loss_mask[:, 1:].astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(log_probs, targets[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    return -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_train_step(cfg: VLConfig, grid: tuple[int, int, int],
                    optimizer: optax.GradientTransformation | None = None):
    """Returns (init_opt_state, jitted train_step).

    The step is a plain jit: shardings flow from the argument placements
    (TP/FSDP params + DP batch via parallel.sharding), and GSPMD inserts
    the gradient all-reduce over "data" and the TP collectives.
    """
    if optimizer is None:
        optimizer = optax.adamw(1e-5)

    @functools.partial(jax.jit, static_argnums=(), donate_argnums=(0, 1))
    def train_step(params, opt_state, batch: TrainBatch):
        loss, grads = jax.value_and_grad(next_token_loss)(params, cfg, batch, grid)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer.init, train_step
