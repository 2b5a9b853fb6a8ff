#!/usr/bin/env python3
"""Device-preprocess decomposition at the bench read workload.

The round-5 read-stage breakdown (per page, batch 24, 1 Mpx grid):
decode 690 ms, prefill 96 ms, **preprocess 94 ms**, vision 38 ms — the
transform chain costs 2.5x the vision tower, making it the second-
largest amdahl lever on the headline after decode. This script times
the chain and its pieces (tunnel-safe differenced fori_loop timing, see
reasoning_profile.py) so the fix targets the real cost.

Writes ``preprocess_profile.json`` at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

from reasoning_profile import loop_time, sync  # tunnel-safe timing


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    assert jax.default_backend() != "cpu", "run on the chip"

    import bench
    from handwritten_ocr_tpu.models.processor import pack_image_device
    from handwritten_ocr_tpu.ops.bank import preprocess_chain
    from handwritten_ocr_tpu.ops.clahe import clahe
    from handwritten_ocr_tpu.ops.gray import rgb_to_gray
    from handwritten_ocr_tpu.ops.threshold import adaptive_threshold_gaussian

    pages = np.stack(bench.synthetic_pages(24))
    batch = jnp.asarray(pages)
    report: dict = {"pages": 24, "page_shape": list(pages.shape[1:])}

    def timed(name, body, init, iters=10):
        t = loop_time(body, init, {}, iters=iters)
        per_page = t / 24
        report[name] = {"ms_total": round(t * 1e3, 2),
                        "ms_per_page": round(per_page * 1e3, 3)}
        print(f"{name:28s}: {t*1e3:8.2f} ms ({per_page*1e3:6.2f} ms/page)",
              flush=True)
        return t

    def dep(x, y):
        return x + (y.reshape(-1)[:1].sum().astype(x.dtype)
                    * jnp.asarray(0, x.dtype))

    # Full production chain (what the bench times as "preprocess").
    def full(i, x, ws):
        def one(img):
            processed = preprocess_chain(img, ["high_contrast", "binarize"])
            return pack_image_device(processed)[0]
        return dep(x, jax.vmap(one)(batch))

    # Components.
    def gray_only(i, x, ws):
        return dep(x, jax.vmap(rgb_to_gray)(batch))

    gray_batch = jax.vmap(rgb_to_gray)(batch)

    def clahe_only(i, x, ws):
        return dep(x, jax.vmap(clahe)(gray_batch))

    clahe_batch = jax.vmap(clahe)(gray_batch)

    def binarize_only(i, x, ws):
        return dep(x, jax.vmap(adaptive_threshold_gaussian)(clahe_batch))

    bin_batch = jax.vmap(adaptive_threshold_gaussian)(clahe_batch)
    rgb_batch = jnp.repeat(bin_batch[..., None], 3, axis=-1)

    def pack_only(i, x, ws):
        return dep(x, jax.vmap(lambda im: pack_image_device(im)[0])(
            rgb_batch))

    # CLAHE sub-stages at one page (vmapped over 24).
    g = gray_batch

    def hist_only(i, x, ws):
        def one(img):
            h, w = img.shape
            ty = tx = 8
            pad_h = (ty - h % ty) % ty or 0
            pad_w = (tx - w % tx) % tx or 0
            if h % ty or w % tx:
                pad_h, pad_w = ty - h % ty, tx - w % tx
            padded = jnp.pad(img, [(0, pad_h), (0, pad_w)], mode="reflect")
            th, tw = padded.shape[0] // ty, padded.shape[1] // tx
            tiles_px = (padded.reshape(ty, th, tx, tw)
                        .transpose(0, 2, 1, 3).reshape(ty * tx, th * tw))
            one_hot = jax.nn.one_hot(tiles_px, 256, dtype=jnp.int32)
            return one_hot.sum(axis=1)
        return dep(x, jax.vmap(one)(g))

    x0 = jnp.zeros((8,), jnp.float32)
    timed("full_chain_plus_pack", full, x0)
    timed("grayscale", gray_only, x0)
    timed("clahe", clahe_only, x0)
    timed("clahe_histogram_stage", hist_only, x0)
    timed("binarize", binarize_only, x0)
    timed("pack", pack_only, x0)

    # Host->device transfer of the raw page batch (the bench's timed
    # preprocess window waits on this 45 MB tunnel h2d).
    jax.device_put(pages)  # warm any lazy path
    walls = []
    for _ in range(3):
        start = time.perf_counter()
        sync(jax.device_put(pages))
        walls.append(time.perf_counter() - start)
    h2d = min(walls)
    report["h2d_page_batch"] = {
        "ms_total": round(h2d * 1e3, 2),
        "ms_per_page": round(h2d / 24 * 1e3, 3),
        "mbytes": round(pages.nbytes / 1e6, 1),
    }
    print(f"{'h2d_page_batch':28s}: {h2d*1e3:8.2f} ms "
          f"({h2d/24*1e3:6.2f} ms/page, {pages.nbytes/1e6:.0f} MB)",
          flush=True)

    (Path(__file__).parent.parent / "preprocess_profile.json").write_text(
        json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
