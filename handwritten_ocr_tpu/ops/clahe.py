"""CLAHE — contrast-limited adaptive histogram equalization.

Contract (reference tools.py:503-516): cv2.createCLAHE(clipLimit=3.0,
tileGridSize=(8, 8)) applied to the grayscale image.

Implements the OpenCV algorithm on device: reflect101-pad to a tile
multiple, per-tile 256-bin histograms (one-hot matmul — MXU-friendly),
clip + excess redistribution (including OpenCV's strided residual pass),
per-tile LUT from the rounded scaled CDF, and bilinear interpolation
between the four neighboring tile LUTs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clahe(image: jnp.ndarray, clip_limit: float = 3.0,
          tiles: tuple[int, int] = (8, 8)) -> jnp.ndarray:
    """uint8 [H, W] grayscale → uint8 [H, W] (OpenCV CLAHE semantics)."""
    h, w = image.shape
    ty, tx = tiles
    if h % ty == 0 and w % tx == 0:
        pad_h = pad_w = 0
    else:
        # OpenCV quirk: when either dim is unaligned, BOTH dims get a
        # (tiles - size % tiles) pad — a full extra tile row/col when the
        # dim was already aligned (clahe.cpp copyMakeBorder branch).
        pad_h = ty - h % ty
        pad_w = tx - w % tx
    tile_h = (h + pad_h) // ty
    tile_w = (w + pad_w) // tx
    padded = jnp.pad(image, [(0, pad_h), (0, pad_w)], mode="reflect")
    ph, pw = padded.shape

    # Per-tile histograms: [ty*tx, 256] via one-hot reduction.
    tiles_px = (padded.reshape(ty, tile_h, tx, tile_w)
                      .transpose(0, 2, 1, 3)
                      .reshape(ty * tx, tile_h * tile_w))
    one_hot = jax.nn.one_hot(tiles_px, 256, dtype=jnp.int32)
    hist = one_hot.sum(axis=1)                              # [T, 256]

    tile_area = tile_h * tile_w
    limit = max(int(clip_limit * tile_area / 256), 1)

    # Clip and redistribute excess (OpenCV: even batch + strided residual).
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(axis=1)                   # [T]
    batch = excess // 256
    residual = excess - batch * 256
    redistributed = clipped + batch[:, None]
    idx = jnp.arange(256)
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)[:, None]
    gets_one = (idx[None, :] % step == 0) & (idx[None, :] // step < residual[:, None])
    redistributed = redistributed + gets_one.astype(jnp.int32)

    # LUT per tile: rounded scaled CDF (cvRound = half-to-even).
    cdf = jnp.cumsum(redistributed, axis=1)
    scale = 255.0 / tile_area
    luts = jnp.clip(jnp.rint(cdf.astype(jnp.float32) * scale), 0, 255)  # [T, 256]
    luts = luts.reshape(ty, tx, 256)

    # Bilinear interpolation between the 4 surrounding tile LUTs,
    # MXU-formulated: per-pixel 3D LUT gathers serialize on TPU
    # (measured 34 ms/page of the 1 Mpx chain — round-5
    # preprocess_profile), so instead every tile's LUT output is
    # computed for every pixel in ONE one-hot matmul
    # ``one_hot(px) @ luts^T`` and blended with sparse per-axis weight
    # matrices (rows of W_y/W_x hold the two bilinear weights at the
    # neighbor tiles, zero elsewhere). Adding exact zeros leaves f32
    # sums unchanged, so the result is identical to the 4-gather form.
    ys = jnp.arange(ph, dtype=jnp.float32)
    xs = jnp.arange(pw, dtype=jnp.float32)
    tyf = ys / tile_h - 0.5
    txf = xs / tile_w - 0.5
    y0 = jnp.clip(jnp.floor(tyf), 0, ty - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(txf), 0, tx - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, ty - 1)
    x1 = jnp.clip(x0 + 1, 0, tx - 1)
    wy = jnp.clip(tyf - jnp.floor(tyf), 0.0, 1.0)
    wx = jnp.clip(txf - jnp.floor(txf), 0.0, 1.0)
    # Border rows/cols outside tile centers use weight 0 toward the clamp.
    wy = jnp.where(tyf < 0, 0.0, jnp.where(tyf > ty - 1, 1.0, wy))
    wx = jnp.where(txf < 0, 0.0, jnp.where(txf > tx - 1, 1.0, wx))

    axis_y = jnp.arange(ty, dtype=jnp.int32)
    axis_x = jnp.arange(tx, dtype=jnp.int32)
    w_y = ((axis_y[None] == y0[:, None]) * (1 - wy)[:, None]
           + (axis_y[None] == y1[:, None]) * wy[:, None])     # [PH, TY]
    w_x = ((axis_x[None] == x0[:, None]) * (1 - wx)[:, None]
           + (axis_x[None] == x1[:, None]) * wx[:, None])     # [PW, TX]

    # bf16 one-hot rows (0/1 exact) with f32 accumulation: each row has
    # exactly one nonzero, so tile_vals holds the integer LUT entries
    # exactly. ~0.5 GB transient per page — callers batching many pages
    # should map pages (lax.map), not vmap, through this op.
    one_hot = jax.nn.one_hot(padded, 256, dtype=jnp.bfloat16)
    lut_cols = luts.reshape(ty * tx, 256).T.astype(jnp.bfloat16)
    tile_vals = jax.lax.dot_general(
        one_hot.reshape(ph * pw, 256), lut_cols,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [PH*PW, T]
    tile_vals = tile_vals.reshape(ph, pw, ty, tx)
    out = jnp.einsum("hwyx,wx->hwy", tile_vals, w_x)
    out = jnp.einsum("hwy,hy->hw", out, w_y)
    out_u8 = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out_u8[:h, :w]
