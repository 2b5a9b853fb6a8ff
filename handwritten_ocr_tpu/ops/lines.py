"""Ruled-line removal (reference tools.py:592-619).

Pipeline contract: detect horizontal lines in the inverted grayscale with a
mean-adaptive threshold (block 15, C=-2), morphological opening with a
(W/4, 1) kernel, a (1, 3) dilation to cover the full line thickness, and
inpaint the masked pixels.

cv2 inpaints with TELEA (fast marching); that algorithm is inherently
sequential, so this implementation inpaints by masked diffusion — an
initial vertical nearest-valid fill followed by fixed Jacobi sweeps —
which converges to near-identical results for thin horizontal line masks
(the only masks this pipeline produces). Documented approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from handwritten_ocr_tpu.ops.filters import dilate_rect, erode_rect
from handwritten_ocr_tpu.ops.gray import rgb_to_gray
from handwritten_ocr_tpu.ops.threshold import adaptive_threshold_mean


def line_mask(gray: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W] grayscale → uint8 {0,255} horizontal-line mask."""
    inverted = jnp.uint8(255) - gray
    thresh = adaptive_threshold_mean(inverted, block_size=15, c=-2)
    kernel_w = max(gray.shape[1] // 4, 1)
    opened = dilate_rect(erode_rect(thresh, kernel_w, 1), kernel_w, 1)
    return dilate_rect(opened, 1, 3)


def inpaint_diffusion(image: jnp.ndarray, mask: jnp.ndarray,
                      iterations: int = 64) -> jnp.ndarray:
    """Fill masked pixels by diffusion from unmasked neighbors.

    image uint8 [H, W] or [H, W, C]; mask uint8/bool [H, W] (nonzero =
    inpaint). Behavior analogous to cv2.inpaint for thin masks.
    """
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    hole = (mask > 0)

    img_f = img.astype(jnp.float32)
    # Initial estimate: average of nearest valid pixels above/below
    # (vertical fill suits horizontal-line holes), via short propagation.
    est = jnp.where(hole[..., None], 0.0, img_f)
    valid = (~hole).astype(jnp.float32)[..., None]

    def propagate(state, _):
        values, weight = state
        up_v, down_v = jnp.roll(values, 1, 0), jnp.roll(values, -1, 0)
        up_w, down_w = jnp.roll(weight, 1, 0), jnp.roll(weight, -1, 0)
        new_w = jnp.maximum(weight, jnp.maximum(up_w, down_w) * 0.5)
        summed = values * weight + up_v * up_w + down_v * down_w
        total = weight + up_w + down_w
        new_v = jnp.where(total > 0, summed / jnp.maximum(total, 1e-6), values)
        keep = weight > 0
        return (jnp.where(keep, values, new_v), new_w), None

    (est, _), _ = jax.lax.scan(propagate, (est, valid), None, length=16)

    start = jnp.where(hole[..., None], est, img_f)

    def jacobi(x, _):
        neighbors = (jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
                     + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)) * 0.25
        return jnp.where(hole[..., None], neighbors, img_f), None

    out, _ = jax.lax.scan(jacobi, start, None, length=iterations)
    out_u8 = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out_u8[..., 0] if squeeze else out_u8


def remove_lines(image: jnp.ndarray) -> jnp.ndarray:
    """Full remove_lines transform on uint8 [H, W] or [H, W, 3]."""
    gray = rgb_to_gray(image) if image.ndim == 3 else image
    mask = line_mask(gray)
    return inpaint_diffusion(image, mask)
