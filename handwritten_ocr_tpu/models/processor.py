"""VLM input processing: smart resize, patch packing, chat template.

Replicates the public Qwen2-VL processor contract (the olmOCR-2 processor):
  * ``smart_resize`` — round dimensions to multiples of patch·merge (28)
    keeping aspect ratio, clamped to [min_pixels, max_pixels];
  * CLIP normalization, then cell-major patch packing
    [grid_t·grid_h·grid_w, C·T·ps·ps] (matching the HF processor's
    transpose order, so patch_embed weights load unchanged);
  * the Qwen2-VL chat template with vision placeholders.

The pipeline's TPU path hands *already preprocessed* device arrays [H, W]
or [H, W, 3] to :func:`pack_image`; file paths are accepted for the
convenience/CLI path.
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Protocol, Sequence, runtime_checkable

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)

IM_START, IM_END = "<|im_start|>", "<|im_end|>"
VISION_START, VISION_END = "<|vision_start|>", "<|vision_end|>"
IMAGE_PAD = "<|image_pad|>"
DEFAULT_SYSTEM = "You are a helpful assistant."


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 256 * 256,
                 max_pixels: int = 1024 * 1024) -> tuple[int, int]:
    """Target (h, w): factor-aligned, aspect-preserving, pixel-clamped."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


@dataclasses.dataclass(frozen=True)
class PackedImage:
    patches: np.ndarray               # [S, C*T*ps*ps] float32
    grid: tuple[int, int, int]        # (t, h, w) patch grid

    @property
    def num_llm_tokens(self) -> int:
        t, h, w = self.grid
        return t * h * w // 4          # spatial merge 2x2


def load_image_rgb(path: str | Path) -> np.ndarray:
    """uint8 [H, W, 3] RGB from an image file."""
    from PIL import Image
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"))


def resize_bicubic(image: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """PIL bicubic resize to (h, w) — matches the HF processor's resample."""
    from PIL import Image
    h, w = size
    if image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    return np.asarray(Image.fromarray(image).resize((w, h), Image.BICUBIC))


def pack_image(
    image: np.ndarray,
    *,
    patch_size: int = 14,
    merge_size: int = 2,
    temporal_patch_size: int = 2,
    min_pixels: int = 256 * 256,
    max_pixels: int = 1024 * 1024,
    do_resize: bool = True,
) -> PackedImage:
    """uint8/float [H, W(, C)] image → normalized flattened patches.

    Follows the HF Qwen2VLImageProcessor pipeline: smart-resize, rescale to
    [0, 1], CLIP-normalize, duplicate the frame to the temporal patch size,
    and pack cell-major.
    """
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    height, width = image.shape[:2]
    factor = patch_size * merge_size
    if do_resize:
        target_h, target_w = smart_resize(height, width, factor,
                                          min_pixels, max_pixels)
        if (target_h, target_w) != (height, width):
            image = resize_bicubic(image, (target_h, target_w))
        height, width = target_h, target_w
    elif height % factor or width % factor:
        raise ValueError(f"image {height}x{width} not {factor}-aligned")

    pixels = image.astype(np.float32) / 255.0
    pixels = (pixels - CLIP_MEAN) / CLIP_STD
    chw = pixels.transpose(2, 0, 1)                       # [C, H, W]
    frames = np.broadcast_to(chw, (temporal_patch_size, *chw.shape))

    channels = chw.shape[0]
    grid_t = 1
    grid_h, grid_w = height // patch_size, width // patch_size
    ps, merge = patch_size, merge_size
    packed = frames.reshape(
        grid_t, temporal_patch_size, channels,
        grid_h // merge, merge, ps,
        grid_w // merge, merge, ps,
    )
    # HF transpose order: (t, h_cell, w_cell, mh, mw, C, T, ps_h, ps_w)
    packed = packed.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = packed.reshape(grid_t * grid_h * grid_w,
                             channels * temporal_patch_size * ps * ps)
    return PackedImage(patches=np.ascontiguousarray(patches),
                       grid=(grid_t, grid_h, grid_w))


def pack_image_device(image, *, patch_size: int = 14, merge_size: int = 2,
                      temporal_patch_size: int = 2):
    """Device-side patch packing (jnp): normalize + patchify, no resize.

    ``image``: uint8 jnp [H, W] or [H, W, 3] with H, W multiples of
    patch·merge (28) — callers resize at load time (smart_resize + PIL
    bicubic, matching the HF processor) so the whole preprocess→pack→
    prefill path stays on device with no host round-trip.
    Returns (patches [S, C·T·ps·ps] float32, grid).
    """
    import jax.numpy as jnp

    if image.ndim == 2:
        image = jnp.stack([image] * 3, axis=-1)
    height, width = image.shape[:2]
    factor = patch_size * merge_size
    if height % factor or width % factor:
        raise ValueError(f"image {height}x{width} not {factor}-aligned")

    pixels = image.astype(jnp.float32) / 255.0
    pixels = (pixels - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    chw = pixels.transpose(2, 0, 1)
    frames = jnp.broadcast_to(chw, (temporal_patch_size, *chw.shape))

    channels = 3
    grid_h, grid_w = height // patch_size, width // patch_size
    ps, merge = patch_size, merge_size
    packed = frames.reshape(
        1, temporal_patch_size, channels,
        grid_h // merge, merge, ps,
        grid_w // merge, merge, ps,
    ).transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = packed.reshape(grid_h * grid_w,
                             channels * temporal_patch_size * ps * ps)
    return patches, (1, grid_h, grid_w)


def aligned_smart_size(height: int, width: int, factor: int = 28,
                       min_pixels: int = 256 * 256,
                       max_pixels: int = 1024 * 1024) -> tuple[int, int]:
    """smart_resize target, exported for load-time resizing."""
    return smart_resize(height, width, factor, min_pixels, max_pixels)


# ── tokenizer protocol + chat template ──────────────────────────────

@runtime_checkable
class TextTokenizer(Protocol):
    """Minimal tokenizer surface the engines need."""

    def encode(self, text: str) -> list[int]: ...
    def decode(self, ids: Sequence[int]) -> str: ...


class ByteTokenizer:
    """Model-free tokenizer: chars → byte ids, ``<|...|>`` specials → real
    Qwen special ids. Powers weights-free drives (dryrun_multichip, tiny
    real-architecture benches) where an HF tokenizer file isn't available
    but prompt structure must still round-trip."""

    SPECIALS = {
        IM_START: 151644, IM_END: 151645,
        VISION_START: 151652, VISION_END: 151653, IMAGE_PAD: 151655,
        "<think>": 151667, "</think>": 151668,
    }

    def __init__(self) -> None:
        import re
        self._pattern = re.compile(
            "|".join(re.escape(s) for s in self.SPECIALS))

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        pos = 0
        for match in self._pattern.finditer(text):
            out.extend(min(ord(c), 255) for c in text[pos:match.start()])
            out.append(self.SPECIALS[match.group()])
            pos = match.end()
        out.extend(min(ord(c), 255) for c in text[pos:])
        return out

    def decode(self, ids) -> str:
        return "".join(chr(i) for i in ids if i < 256)


class HFTokenizer:
    """transformers AutoTokenizer wrapper (loads from a local model dir)."""

    def __init__(self, model_dir: str | Path):
        from transformers import AutoTokenizer
        self._tok = AutoTokenizer.from_pretrained(str(model_dir))

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids), skip_special_tokens=True)


def vlm_chat_prompt(user_text: str, num_image_tokens: int,
                    system: str = DEFAULT_SYSTEM) -> str:
    """Qwen2-VL chat-template prompt with one image before the user text."""
    vision = f"{VISION_START}{IMAGE_PAD * num_image_tokens}{VISION_END}"
    return (
        f"{IM_START}system\n{system}{IM_END}\n"
        f"{IM_START}user\n{vision}{user_text}{IM_END}\n"
        f"{IM_START}assistant\n"
    )


def llm_chat_prompt(system: str, user_text: str,
                    enable_thinking: bool = False) -> str:
    """Qwen3 chat-template prompt (non-thinking mode appends empty think)."""
    parts = []
    if system:
        parts.append(f"{IM_START}system\n{system}{IM_END}\n")
    parts.append(f"{IM_START}user\n{user_text}{IM_END}\n")
    parts.append(f"{IM_START}assistant\n")
    if not enable_thinking:
        parts.append("<think>\n\n</think>\n\n")
    return "".join(parts)
