"""Geometry: minimum-area rectangle (host) + affine warp (device).

Contract (reference tools.py:549-573 deskew): collect dark-pixel
coordinates (gray < 128, in (row, col) order), skip if <= 100 points, take
cv2.minAreaRect's angle, fold it ({angle < -45 → -(90+angle), else
-angle}), rotate about the integer image center with INTER_CUBIC over a
replicate border.

The rectangle search runs host-side on the (tiny) convex hull; the warp is
a vectorized bicubic gather on device.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; points [N, 2] float; hull CCW [M, 2]."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(iterable):
        chain: list[np.ndarray] = []
        for p in iterable:
            while len(chain) >= 2:
                u = chain[-1] - chain[-2]
                v = p - chain[-2]
                if u[0] * v[1] - u[1] * v[0] > 0:  # strict left turn keeps
                    break
                chain.pop()
            chain.append(p)
        return chain

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect_angle(points: np.ndarray) -> float:
    """Angle (degrees) of the min-area rect, cv2 5.x convention [-90, 0).

    ``points`` are [N, 2] in the same axis order the caller uses with cv2
    (the reference passes (row, col)). Verified against cv2.minAreaRect in
    the test suite; axis-aligned clouds give -90.0 as cv2 does.
    """
    hull = convex_hull(points.astype(np.float64))
    if len(hull) <= 2:
        return -90.0
    best_area, best_angle = np.inf, 0.0
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    for edge in edges:
        norm = math.hypot(edge[0], edge[1])
        if norm == 0:
            continue
        ux, uy = edge[0] / norm, edge[1] / norm
        proj_u = hull @ np.array([ux, uy])
        proj_v = hull @ np.array([-uy, ux])
        area = (proj_u.max() - proj_u.min()) * (proj_v.max() - proj_v.min())
        if area < best_area - 1e-9:
            best_area = area
            best_angle = math.degrees(math.atan2(uy, ux)) % 90.0
    return best_angle - 90.0


def deskew_angle(gray: np.ndarray, dark_threshold: int = 128,
                 min_points: int = 100) -> float | None:
    """Rotation angle for the reference deskew, or None to skip."""
    rows, cols = np.nonzero(gray < dark_threshold)
    if len(rows) <= min_points:
        return None
    coords = np.column_stack([rows, cols])  # (y, x) order as the reference
    angle = min_area_rect_angle(coords)
    if angle < -45:  # kept for contract parity; unreachable with (0, 90]
        return -(90 + angle)
    return -angle


def rotation_matrix(center: tuple[float, float], angle_deg: float) -> np.ndarray:
    """cv2.getRotationMatrix2D(center, angle, 1.0) — the forward map."""
    alpha = math.cos(math.radians(angle_deg))
    beta = math.sin(math.radians(angle_deg))
    cx, cy = center
    return np.array([
        [alpha, beta, (1 - alpha) * cx - beta * cy],
        [-beta, alpha, beta * cx + (1 - alpha) * cy],
    ])


def _invert_affine(m: np.ndarray) -> np.ndarray:
    a = m[:, :2]
    inv = np.linalg.inv(a)
    t = -inv @ m[:, 2]
    return np.hstack([inv, t[:, None]])


def _cubic_weights(frac: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Bicubic taps with A=-0.75 (cv2 INTER_CUBIC)."""
    a = -0.75
    f = frac
    w0 = ((a * (f + 1) - 5 * a) * (f + 1) + 8 * a) * (f + 1) - 4 * a
    w1 = ((a + 2) * f - (a + 3)) * f * f + 1
    g = 1 - f
    w2 = ((a + 2) * g - (a + 3)) * g * g + 1
    w3 = 1 - w0 - w1 - w2
    return w0, w1, w2, w3


def warp_affine_bicubic(image: jnp.ndarray, matrix: np.ndarray,
                        out_shape: tuple[int, int] | None = None) -> jnp.ndarray:
    """cv2.warpAffine(..., INTER_CUBIC, BORDER_REPLICATE) equivalent.

    ``matrix`` is the forward 2x3 map (dst←src inversion happens here, as
    cv2 does). Works on uint8 [H, W] or [H, W, C]; returns uint8.
    """
    h, w = image.shape[:2]
    out_h, out_w = out_shape or (h, w)
    inv = _invert_affine(np.asarray(matrix, np.float64))

    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2]
    sy = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2]

    x_floor = jnp.floor(sx)
    y_floor = jnp.floor(sy)
    fx = sx - x_floor
    fy = sy - y_floor
    wx = _cubic_weights(fx)
    wy = _cubic_weights(fy)

    img_f = image.astype(jnp.float32)
    acc = jnp.zeros((out_h, out_w) + image.shape[2:], jnp.float32)
    for j in range(4):
        yy = jnp.clip(y_floor.astype(jnp.int32) - 1 + j, 0, h - 1)
        row_acc = jnp.zeros_like(acc)
        for i in range(4):
            xx = jnp.clip(x_floor.astype(jnp.int32) - 1 + i, 0, w - 1)
            sample = img_f[yy, xx]
            weight = wx[i]
            if image.ndim == 3:
                weight = weight[..., None]
            row_acc = row_acc + weight * sample
        weight_y = wy[j][..., None] if image.ndim == 3 else wy[j]
        acc = acc + weight_y * row_acc
    return jnp.clip(jnp.rint(acc), 0, 255).astype(jnp.uint8)
