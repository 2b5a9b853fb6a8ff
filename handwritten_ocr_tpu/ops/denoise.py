"""Non-local means denoising (reference tools.py:576-589).

The reference calls ``cv2.fastNlMeansDenoising{Colored}(h=10, template 7,
search 21)``. Black-box probing of cv2 on this host pinned down its exact
semantics, and this implementation reproduces them:

- **Grayscale / per-group core** (:func:`nl_means`): weights
  ``exp(-(patch_ssd / (template^2 * channels)) / h^2)`` over the 21x21
  search window (center included), reflect-101 borders, and a
  round-half-up weighted average. In float64 this is bit-identical to
  ``cv2.fastNlMeansDenoising`` on every image probed (cv2's fixed-point
  weight LUT and its ``>> 6`` distance quantization land inside float
  rounding); the device runs float32, which the golden tests bound at
  <= 1 gray level.
- **Colored** (:func:`nl_means_colored`): cv2 detours through the
  LINEAR-variant CIELAB (``COLOR_LBGR2Lab`` — no sRGB gamma;
  denoising.cpp), denoises L alone with ``h`` and the (a, b) pair
  jointly (2-channel patch distance) with ``h_color``, then converts
  back. Both conversions come from ops/colorspace.py (forward bit-exact,
  backward <= 1 level). The channel-order quirk of the reference —
  an RGB array fed to the BGR-assuming cv2 API (tools.py:582-584) — is
  reproduced by passing the image through unchanged.

TPU-first: one ``lax.scan`` over the 441 search offsets with a separable
box filter per step; everything stays on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nl_means(image: jnp.ndarray, h: float = 10.0, template: int = 7,
             search: int = 21) -> jnp.ndarray:
    """uint8 [H, W] or [H, W, C] → uint8 denoised (joint C-channel
    distance, matching cv2's multi-channel fastNlMeansDenoising)."""
    squeeze = image.ndim == 2
    img = image[..., None] if squeeze else image
    height, width, channels = img.shape
    half_search = search // 2
    half_tmpl = template // 2
    pad = half_search + half_tmpl

    img_f = img.astype(jnp.float32)
    padded = jnp.pad(img_f, [(pad, pad), (pad, pad), (0, 0)], mode="reflect")

    center = jax.lax.dynamic_slice(
        padded, (half_search, half_search, 0),
        (height + 2 * half_tmpl, width + 2 * half_tmpl, channels))

    offsets = np.stack(np.meshgrid(
        np.arange(search), np.arange(search), indexing="ij"),
        axis=-1).reshape(-1, 2).astype(np.int32)

    # cv2 weight normalization: exp(-ssd / (template^2 * channels * h^2)).
    norm = jnp.float32(1.0 / (h * h))

    def body(carry, offset):
        acc, weight_sum = carry
        dy, dx = offset[0], offset[1]
        shifted = jax.lax.dynamic_slice(
            padded, (dy, dx, 0),
            (height + 2 * half_tmpl, width + 2 * half_tmpl, channels))
        diff2 = ((center - shifted) ** 2).sum(axis=-1)
        # Separable box sum over the template window ('valid' crop).
        rows = sum(diff2[:, i:i + width] for i in range(template))
        dist = sum(rows[i:i + height] for i in range(template))
        dist = dist / (template * template * channels)
        w = jnp.exp(-dist * norm)
        neigh = jax.lax.dynamic_slice(
            padded, (dy + half_tmpl, dx + half_tmpl, 0),
            (height, width, channels))
        return (acc + w[..., None] * neigh, weight_sum + w), None

    init = (jnp.zeros((height, width, channels), jnp.float32),
            jnp.zeros((height, width), jnp.float32))
    (acc, weight_sum), _ = jax.lax.scan(body, init, jnp.asarray(offsets))
    out = acc / weight_sum[..., None]
    # cv2 rounds half UP (estimation + weights_sum/2) / weights_sum.
    out_u8 = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    return out_u8[..., 0] if squeeze else out_u8


def nl_means_colored(rgb: jnp.ndarray, h: float = 10.0,
                     h_color: float = 10.0, template: int = 7,
                     search: int = 21) -> jnp.ndarray:
    """cv2.fastNlMeansDenoisingColored semantics (tools.py:584): convert
    via the LINEAR Lab variant (COLOR_LBGR2Lab), denoise L alone with
    ``h`` and the (a, b) pair jointly with ``h_color``, convert back.
    The input passes through in the caller's channel order, reproducing
    the reference's RGB-into-BGR-API quirk exactly."""
    from handwritten_ocr_tpu.ops.colorspace import (
        lab_u8_to_linear_bgr, linear_bgr_to_lab_u8)
    lab_u8 = linear_bgr_to_lab_u8(rgb)
    lum = nl_means(lab_u8[..., 0], h=h, template=template, search=search)
    chroma = nl_means(lab_u8[..., 1:], h=h_color, template=template,
                      search=search)
    merged = jnp.concatenate([lum[..., None], chroma], axis=-1)
    return lab_u8_to_linear_bgr(merged)
