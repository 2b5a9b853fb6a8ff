"""Transform registry and strategy-chain driver.

Mirrors the reference registry + chain semantics (tools.py:622-673):
transforms apply left-to-right; "original" is a no-op; unknown names warn
and skip. Color-mode transitions match the reference PIL behavior:
high_contrast and binarize return grayscale, deskew/denoise/remove_lines
preserve the input mode, sharpen filters whatever it is given.

All transforms take/return uint8 jnp arrays ([H, W] gray or [H, W, 3]
RGB) — images stay device-resident through the whole chain.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu.ops.clahe import clahe
from handwritten_ocr_tpu.ops.denoise import nl_means
from handwritten_ocr_tpu.ops.geometry import (
    deskew_angle,
    rotation_matrix,
    warp_affine_bicubic,
)
from handwritten_ocr_tpu.ops.gray import rgb_to_gray
from handwritten_ocr_tpu.ops.lines import remove_lines
from handwritten_ocr_tpu.ops.sharpen import sharpen
from handwritten_ocr_tpu.ops.threshold import adaptive_threshold_gaussian


def apply_high_contrast(image: jnp.ndarray) -> jnp.ndarray:
    """CLAHE clip 3.0, 8x8 tiles on grayscale (tools.py:503-516)."""
    return clahe(rgb_to_gray(image))


def apply_binarize(image: jnp.ndarray) -> jnp.ndarray:
    """Adaptive Gaussian threshold, block 21, C=10 (tools.py:519-531)."""
    return adaptive_threshold_gaussian(rgb_to_gray(image))


def apply_sharpen(image: jnp.ndarray) -> jnp.ndarray:
    """5-point kernel sharpen, any mode (tools.py:534-546)."""
    return sharpen(image)


def apply_deskew(image: jnp.ndarray) -> jnp.ndarray:
    """Rotate by the min-area-rect angle of dark pixels (tools.py:549-573).

    The angle search runs host-side on the dark-pixel set (data-dependent
    size — inherently host logic, matching the reference); the bicubic
    warp runs on device. Images with <= 100 dark pixels pass through.
    """
    gray = rgb_to_gray(image) if image.ndim == 3 else image
    angle = deskew_angle(np.asarray(gray))
    if angle is None:
        return image
    h, w = gray.shape
    matrix = rotation_matrix((w // 2, h // 2), angle)
    return warp_affine_bicubic(image, matrix)


def apply_denoise(image: jnp.ndarray) -> jnp.ndarray:
    """Non-local means, h=10, template 7, search 21 (tools.py:576-589):
    RGB goes through the CIELAB L/ab split like fastNlMeansDenoisingColored;
    grayscale uses the single-plane variant like fastNlMeansDenoising."""
    if image.ndim == 3:
        from handwritten_ocr_tpu.ops.denoise import nl_means_colored
        return nl_means_colored(image)
    return nl_means(image)


def apply_remove_lines(image: jnp.ndarray) -> jnp.ndarray:
    """Horizontal ruled-line removal + inpaint (tools.py:592-619)."""
    return remove_lines(image)


TRANSFORMS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "high_contrast": apply_high_contrast,
    "binarize": apply_binarize,
    "sharpen": apply_sharpen,
    "deskew": apply_deskew,
    "denoise": apply_denoise,
    "remove_lines": apply_remove_lines,
}


def preprocess_chain(image: jnp.ndarray, strategy: str | Sequence[str],
                     quiet: bool = True) -> jnp.ndarray:
    """Apply a strategy chain left-to-right (tools.py:633-665 semantics)."""
    steps = [strategy] if isinstance(strategy, str) else list(strategy)
    out = image
    for step in steps:
        if step == "original":
            continue
        transform = TRANSFORMS.get(step)
        if transform is None:
            if not quiet:
                print(f"  [preprocess] Unknown transform '{step}', skipping")
            continue
        out = transform(out)
    return out
