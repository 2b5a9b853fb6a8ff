"""Sharpening (reference tools.py:534-546).

cv2.filter2D with the 5-point kernel [[0,-1,0],[-1,5,-1],[0,-1,0]] over the
default BORDER_REFLECT_101 border, saturating back to uint8. The kernel is
integer-valued, so the result is bit-exact.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu.ops.filters import conv2d_fixed

_KERNEL = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], dtype=np.float32)


def sharpen(image: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W] or [H, W, C] → uint8, cv2.filter2D-equivalent."""
    out = conv2d_fixed(image, _KERNEL, border="reflect101")
    return jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
