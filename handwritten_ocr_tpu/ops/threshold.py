"""Adaptive thresholding (cv2.adaptiveThreshold semantics).

Contracts:
  * binarize (reference tools.py:519-531): ADAPTIVE_THRESH_GAUSSIAN_C,
    THRESH_BINARY, blockSize 21, C=10 on grayscale.
  * remove_lines mask (tools.py:604-606): ADAPTIVE_THRESH_MEAN_C,
    THRESH_BINARY, blockSize 15, C=-2 on the inverted grayscale.

dst = maxval where src > mean - C else 0, with the local mean from a
rounded Gaussian/box blur over a replicate border.
"""

from __future__ import annotations

import jax.numpy as jnp

from handwritten_ocr_tpu.ops.filters import (
    box_mean,
    gaussian_kernel_1d,
    round_half_even_u8,
    separable_filter,
)


def adaptive_threshold_gaussian(image: jnp.ndarray, block_size: int = 21,
                                c: float = 10, maxval: int = 255) -> jnp.ndarray:
    """uint8 [H, W] → uint8 binary (GAUSSIAN_C / THRESH_BINARY)."""
    kernel = gaussian_kernel_1d(block_size)
    mean = round_half_even_u8(separable_filter(image, kernel, "replicate"))
    return _binary(image, mean, c, maxval)


def adaptive_threshold_mean(image: jnp.ndarray, block_size: int = 15,
                            c: float = -2, maxval: int = 255) -> jnp.ndarray:
    """uint8 [H, W] → uint8 binary (MEAN_C / THRESH_BINARY)."""
    mean = round_half_even_u8(box_mean(image, block_size, "replicate"))
    return _binary(image, mean, c, maxval)


def _binary(src: jnp.ndarray, mean: jnp.ndarray, c: float, maxval: int):
    delta = int(round(c))
    keep = src.astype(jnp.int32) > (mean.astype(jnp.int32) - delta)
    return jnp.where(keep, jnp.uint8(maxval), jnp.uint8(0))
