"""Non-local means denoising (reference tools.py:576-589).

The reference calls cv2.fastNlMeansDenoising{Colored}(h=10, template 7,
search 21). OpenCV's exact variant is a heavily LUT-approximated
implementation (and the colored one detours through CIELAB); a bit-exact
port would be host-bound and serial. This is the classic NL-means
formulation instead — per-pixel weighted average over a 21x21 search
window, weights from 7x7 patch L2 distances — which matches OpenCV's
output closely in effect (noise suppressed, edges kept) and is fully
vectorized on device: one ``lax.scan`` over the 441 search offsets with a
separable box filter per step. Documented approximation; the tolerance
tests assert denoising behavior rather than bit equality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nl_means(image: jnp.ndarray, h: float = 10.0, template: int = 7,
             search: int = 21) -> jnp.ndarray:
    """uint8 [H, W] or [H, W, C] → uint8 denoised."""
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

    # cv2 weight normalization: exp(-sum(d^2) / (h^2 * templ^2 * channels)).
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
    out_u8 = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out_u8[..., 0] if squeeze else out_u8


def nl_means_colored(rgb: jnp.ndarray, h: float = 10.0,
                     h_color: float = 10.0, template: int = 7,
                     search: int = 21) -> jnp.ndarray:
    """cv2.fastNlMeansDenoisingColored structure (tools.py:584): convert
    to CIELAB (8-bit scale), denoise L alone with ``h`` and the (a, b)
    pair jointly with ``h_color``, convert back."""
    from handwritten_ocr_tpu.ops.colorspace import lab_to_rgb, rgb_to_lab
    lab = rgb_to_lab(rgb)
    lab_u8 = jnp.clip(jnp.rint(lab), 0, 255).astype(jnp.uint8)
    lum = nl_means(lab_u8[..., 0], h=h, template=template, search=search)
    chroma = nl_means(lab_u8[..., 1:], h=h_color, template=template,
                      search=search)
    merged = jnp.concatenate([lum[..., None], chroma], axis=-1)
    return lab_to_rgb(merged.astype(jnp.float32))
