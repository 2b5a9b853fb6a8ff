"""Fine-tuning data pipeline: (page image, transcription) → TrainBatch.

Builds supervised batches for the VLM training step: the prompt is the
production chat template (image + OCR instruction), the target is the
ground-truth transcription followed by ``<|im_end|>``, and the loss mask
covers only the target tokens. Pages are grouped by patch grid (same
bucketing the inference engine uses) so every batch has static shapes.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from handwritten_ocr_tpu import config as cfg_mod
from handwritten_ocr_tpu.models.processor import (
    TextTokenizer,
    load_image_rgb,
    pack_image,
    vlm_chat_prompt,
)
from handwritten_ocr_tpu.models.qwen25vl.model import rope_index_for_prompt
from handwritten_ocr_tpu.text import parse_ground_truth


@dataclasses.dataclass(frozen=True)
class Example:
    image_path: str
    target_text: str


def discover_examples(image_dir: str | Path,
                      gt_dir: str | Path | None = None) -> list[Example]:
    """Pair images with ground-truth files by stem (CLI matching rules)."""
    from handwritten_ocr_tpu.cli.transcribe import IMAGE_EXTENSIONS

    image_dir = Path(image_dir)
    gt_dir = Path(gt_dir) if gt_dir else image_dir
    examples = []
    for image_path in sorted(image_dir.iterdir()):
        if image_path.suffix.lower() not in IMAGE_EXTENSIONS:
            continue
        for ext in (".md", ".txt"):
            candidate = gt_dir / f"{image_path.stem}{ext}"
            if candidate.exists():
                text = parse_ground_truth(candidate)
                if text:
                    examples.append(Example(str(image_path), text))
                break
    return examples


def build_batch(
    examples: Sequence[Example],
    tokenizer: TextTokenizer,
    vl_config,
    prompt: str = cfg_mod.OCR_PROMPT,
    max_target_tokens: int = cfg_mod.OCR_MAX_NEW_TOKENS,
    min_pixels: int = cfg_mod.OCR_MIN_PIXELS,
    max_pixels: int = cfg_mod.OCR_MAX_PIXELS,
):
    """One TrainBatch (+ grid) from same-grid examples.

    All examples must resolve to the same patch grid (use
    :func:`batches_by_grid` to bucket). Sequences are right-padded with the
    pad token; padded positions carry zero loss.
    """
    from handwritten_ocr_tpu.train.step import TrainBatch
    import jax.numpy as jnp

    packed = [pack_image(load_image_rgb(ex.image_path),
                         min_pixels=min_pixels, max_pixels=max_pixels)
              for ex in examples]
    grids = {p.grid for p in packed}
    if len(grids) != 1:
        raise ValueError(f"examples span multiple grids: {grids}")
    grid = packed[0].grid
    n_image_tokens = packed[0].num_llm_tokens

    rows, masks = [], []
    image_token = vl_config.image_token_id
    for ex in examples:
        prompt_text = vlm_chat_prompt(prompt, num_image_tokens=1)
        prompt_ids: list[int] = []
        for tok in tokenizer.encode(prompt_text):
            if tok == image_token:
                prompt_ids.extend([image_token] * n_image_tokens)
            else:
                prompt_ids.append(tok)
        target_ids = tokenizer.encode(ex.target_text)[:max_target_tokens]
        target_ids = target_ids + [vl_config.eos_token_id]
        rows.append(prompt_ids + target_ids)
        masks.append([0.0] * len(prompt_ids) + [1.0] * len(target_ids))

    longest = max(len(r) for r in rows)
    pad = vl_config.pad_token_id
    input_ids = np.full((len(rows), longest), pad, dtype=np.int32)
    loss_mask = np.zeros((len(rows), longest), dtype=np.float32)
    for i, (row, mask) in enumerate(zip(rows, masks)):
        input_ids[i, :len(row)] = row
        loss_mask[i, :len(row)] = mask

    positions = np.stack([
        rope_index_for_prompt(input_ids[i], vl_config, [grid])[0]
        for i in range(len(rows))
    ], axis=1)                                   # [3, B, T]

    patches = np.stack([p.patches for p in packed])
    batch = TrainBatch(
        input_ids=jnp.asarray(input_ids),
        patches=jnp.asarray(patches),
        position_ids=jnp.asarray(positions),
        loss_mask=jnp.asarray(loss_mask),
    )
    return batch, grid


def batches_by_grid(
    examples: Sequence[Example],
    tokenizer: TextTokenizer,
    vl_config,
    batch_size: int,
    **kwargs,
) -> Iterator[tuple]:
    """Yield (TrainBatch, grid) groups bucketed by patch grid."""
    buckets: dict[tuple, list[Example]] = {}
    for ex in examples:
        image = load_image_rgb(ex.image_path)
        grid = pack_image(image, min_pixels=kwargs.get("min_pixels",
                                                       cfg_mod.OCR_MIN_PIXELS),
                          max_pixels=kwargs.get("max_pixels",
                                                cfg_mod.OCR_MAX_PIXELS)).grid
        buckets.setdefault(grid, []).append(ex)
    for grid, bucket in buckets.items():
        for start in range(0, len(bucket), batch_size):
            chunk = bucket[start:start + batch_size]
            yield build_batch(chunk, tokenizer, vl_config, **kwargs)
