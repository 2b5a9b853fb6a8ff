"""Separable filtering primitives with OpenCV border semantics."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics (sigma<=0 → derived from ksize)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    # cv2 uses the hardcoded small kernels only for ksize<=7 AND sigma<=0;
    # adaptiveThreshold's 21/15 blocks take the analytic path below.
    if sigma <= 0 and ksize in (1, 3, 5, 7):  # pragma: no cover
        tables = {1: [1.0], 3: [0.25, 0.5, 0.25],
                  5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
                  7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875,
                      0.109375, 0.03125]}
        return np.array(tables[ksize])
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    kernel = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return kernel / kernel.sum()


def pad2d(image: jnp.ndarray, pad_h: int, pad_w: int, border: str) -> jnp.ndarray:
    """Pad with an OpenCV border mode: 'replicate' or 'reflect101'."""
    mode = {"replicate": "edge", "reflect101": "reflect"}[border]
    widths = [(pad_h, pad_h), (pad_w, pad_w)] + [(0, 0)] * (image.ndim - 2)
    return jnp.pad(image, widths, mode=mode)


def separable_filter(image: jnp.ndarray, kernel_1d: np.ndarray,
                     border: str = "replicate") -> jnp.ndarray:
    """2D filter with a separable kernel; float32 output, [H, W] input."""
    k = jnp.asarray(kernel_1d, jnp.float32)
    ksize = k.shape[0]
    pad = ksize // 2
    x = pad2d(image.astype(jnp.float32), pad, pad, border)
    # Row pass then column pass, as strided stacks (XLA fuses the adds).
    x = sum(x[:, i:i + image.shape[1]] * k[i] for i in range(ksize))
    x = sum(x[i:i + image.shape[0]] * k[i] for i in range(ksize))
    return x


def box_mean(image: jnp.ndarray, ksize: int,
             border: str = "replicate") -> jnp.ndarray:
    """Normalized box filter (cv2 boxFilter normalize=True)."""
    kernel = np.full(ksize, 1.0 / ksize)
    return separable_filter(image, kernel, border)


def conv2d_fixed(image: jnp.ndarray, kernel: np.ndarray,
                 border: str = "reflect101") -> jnp.ndarray:
    """Small dense 2D correlation (cv2.filter2D semantics), float32 out.

    Works on [H, W] or [H, W, C]; kernel is a small numpy array.
    """
    kh, kw = kernel.shape
    pad_h, pad_w = kh // 2, kw // 2
    x = pad2d(image.astype(jnp.float32), pad_h, pad_w, border)
    h, w = image.shape[:2]
    out = jnp.zeros_like(image, dtype=jnp.float32)
    for i in range(kh):
        for j in range(kw):
            weight = float(kernel[i, j])
            if weight == 0.0:
                continue
            out = out + weight * x[i:i + h, j:j + w]
    return out


def round_half_even_u8(x: jnp.ndarray) -> jnp.ndarray:
    """saturate_cast<uchar> of a float (cvRound = round half to even)."""
    return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.uint8)


def erode_rect(binary: jnp.ndarray, kw: int, kh: int) -> jnp.ndarray:
    """Rect-kernel erosion (min filter), replicate border, uint8 in/out."""
    return _rect_extremum(binary, kw, kh, jnp.minimum)


def dilate_rect(binary: jnp.ndarray, kw: int, kh: int) -> jnp.ndarray:
    """Rect-kernel dilation (max filter), replicate border, uint8 in/out."""
    return _rect_extremum(binary, kw, kh, jnp.maximum)


def _rect_extremum(image: jnp.ndarray, kw: int, kh: int, op) -> jnp.ndarray:
    # cv2 center anchor: window [x - k//2, x + (k-1)//2] for even kernels.
    h, w = image.shape
    pad_w_lo, pad_w_hi = kw // 2, (kw - 1) // 2
    pad_h_lo, pad_h_hi = kh // 2, (kh - 1) // 2
    x = jnp.pad(image, [(pad_h_lo, pad_h_hi), (pad_w_lo, pad_w_hi)], mode="edge")
    # Horizontal pass.
    if kw > 1:
        acc = x[:, 0:w]
        for i in range(1, kw):
            acc = op(acc, x[:, i:i + w])
        x = acc
    else:
        x = x[:, :w]
    # Vertical pass.
    if kh > 1:
        acc = x[0:h]
        for i in range(1, kh):
            acc = op(acc, x[i:i + h])
        x = acc
    else:
        x = x[:h]
    return x
