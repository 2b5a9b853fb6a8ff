#!/usr/bin/env python3
"""Decode-step component microbenchmark (run on the TPU chip).

Times each component of one 7B int8 decode step at serving shapes
(batch 8) against its HBM-floor cost — isolating where the 21.7 ms step
(vs the 9.9 ms floor) goes.

Methodology for the axon tunnel (per-dispatch latency 3-5 ms, async
round trips lie): every op is looped N times inside ONE jitted
``lax.fori_loop`` dispatch with a value dependency chained through the
carry, so the measurement is throughput, exactly like the op's situation
inside the real decode while_loop.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

HBM = 819e9
N = 100


def sync(x):
    import jax
    jax.block_until_ready(x)   # no host transfer — tunnel pulls are slow
    return 0.0


def loop_time(make_body, init, iters=N):
    """One dispatch: fori_loop of the op with carried dependency."""
    import jax

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, iters, make_body, carry)

    out = run(init)          # compile + warm
    sync(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    out = run(init)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.models.quant import _quantize_linear
    from handwritten_ocr_tpu.ops.int8_matmul import int8_matmul

    assert jax.default_backend() != "cpu", "run on the chip"
    batch = 8
    key = jax.random.PRNGKey(0)

    def dep(x, y):
        """Chain y into x without changing values meaningfully."""
        return x + y.sum().astype(x.dtype) * jnp.asarray(1e-30, x.dtype)

    shapes = {
        "q    3584x3584 ": (3584, 3584),
        "kv   3584x512  ": (3584, 512),
        "gate 3584x18944": (3584, 18944),
        "down 18944x3584": (18944, 3584),
    }
    print(f"== int8 matmuls, batch {batch} ({N}-loop, one dispatch) ==")
    per_layer = 0.0
    counts = {"q    3584x3584 ": 2, "kv   3584x512  ": 2,
              "gate 3584x18944": 2, "down 18944x3584": 1}
    for name, (d_in, d_out) in shapes.items():
        w = _quantize_linear({"w": jax.random.normal(key, (d_in, d_out),
                                                     jnp.float32) * 0.02})
        x0 = jax.random.normal(key, (batch, d_in), jnp.bfloat16)

        def body(i, x, w=w):
            y = int8_matmul(x, w["w_q"], w["w_scale"])
            return dep(x, y)
        t = loop_time(body, x0)
        floor = d_in * d_out / HBM
        per_layer += t * counts[name]
        print(f"  {name}: {t*1e6:7.1f} us  floor {floor*1e6:6.1f} us "
              f"({100*floor/t:5.1f}% SoL)  x{counts[name]}/layer")
    print(f"  per-layer matmuls {per_layer*1e3:.3f} ms -> x28 = "
          f"{per_layer*28*1e3:.2f} ms/step")

    print("== lm_head bf16 ==")
    d, v = 3584, 152064
    w_head = jax.random.normal(key, (d, v), jnp.bfloat16) * 0.02
    x0 = jax.random.normal(key, (batch, d), jnp.bfloat16)

    def head_body(i, x):
        y = jnp.einsum("bd,dv->bv", x, w_head,
                       preferred_element_type=jnp.float32)
        return dep(x, y[:, :8])
    t = loop_time(head_body, x0)
    floor = d * v * 2 / HBM
    print(f"  lm_head bf16: {t*1e3:6.3f} ms  floor {floor*1e3:5.2f} ms "
          f"({100*floor/t:5.1f}% SoL)")

    def head8_body(i, x):
        y = int8_matmul(x, w_head_q["w_q"], w_head_q["w_scale"])
        return dep(x, y[:, :8])
    w_head_q = _quantize_linear({"w": jax.random.normal(
        key, (d, v), jnp.float32) * 0.02})
    t = loop_time(head8_body, x0)
    floor = d * v / HBM
    print(f"  lm_head int8: {t*1e3:6.3f} ms  floor {floor*1e3:5.2f} ms "
          f"({100*floor/t:5.1f}% SoL)")

    print("== paged attention kernel ==")
    from jax.experimental.pallas.ops.tpu.paged_attention. \
        paged_attention_kernel import paged_attention
    h_kv, n_blocks, bs, hd, mb = 4, 361, 64, 128, 45
    k_pool = jax.random.normal(key, (h_kv, n_blocks, bs, hd), jnp.bfloat16)
    v_pool = jax.random.normal(key, (h_kv, n_blocks, bs, hd), jnp.bfloat16)
    tables = jnp.asarray(
        np.random.default_rng(0).integers(1, n_blocks, (batch, mb)), jnp.int32)
    lengths = jnp.asarray([900, 500, 1100, 1300, 400, 500, 840, 700],
                          jnp.int32)
    q0 = jax.random.normal(key, (batch, 28, hd), jnp.bfloat16)

    def attn_body(i, q):
        out = paged_attention(q, k_pool, v_pool, lengths, tables,
                              pages_per_compute_block=5)
        return dep(q, out)
    t = loop_time(attn_body, q0)
    mean_len = float(np.mean(np.asarray(lengths)))
    floor = 2 * batch * mean_len * h_kv * hd * 2 / HBM
    print(f"  one layer: {t*1e6:7.1f} us  floor(len-bounded) "
          f"{floor*1e6:6.1f} us ({100*floor/t:5.1f}% SoL)  -> x28 = "
          f"{t*28*1e3:.2f} ms/step")

    print("== kv scatter write (one layer, T=1) ==")
    pos = jnp.asarray(lengths)
    blocks = jnp.take_along_axis(tables, (pos // bs)[:, None], axis=1)[:, 0]
    new0 = jax.random.normal(key, (h_kv, batch, hd), jnp.bfloat16)

    def scatter_body(i, carry):
        pool, new = carry
        pool = pool.at[:, blocks, pos % bs].set(new)
        return (pool, dep(new, pool[:, 1, 0, :2]))
    t = loop_time(scatter_body, (jnp.array(k_pool), new0))
    copy_cost = k_pool.size * 2 * 2 / HBM
    print(f"  scatter: {t*1e6:7.1f} us (pool copy would be "
          f"{copy_cost*1e6:.0f} us) -> x56 = {t*56*1e3:.2f} ms/step")

    print("== gather window (the CPU-fallback path, for reference) ==")
    def gather_body(i, q):
        g = k_pool[:, tables]                         # [H, B, MB, BS, D]
        return dep(q, g[:, :, 0, 0, :2])
    t = loop_time(gather_body, q0, iters=20)
    print(f"  gather: {t*1e6:7.1f} us -> x56 = {t*56*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
