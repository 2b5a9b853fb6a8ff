#!/usr/bin/env python3
"""Decode-glue microbenchmark at serving batch (24 slots, 7B dims).

Round-2 measurement: the decode step runs at ~68% of its HBM floor, and
the residue lives in the weight path (int8 widening + rmsnorm/rope/
lm_logits glue), not attention. This script isolates the candidate
fusions before any refactor:

  1. separate q/k/v int8 matmuls  vs  ONE fused [3584, 4608] matmul
  2. separate gate/up             vs  ONE fused [3584, 37888]
  3. rmsnorm as its own fusion    vs  normalization inlined before matmul
  4. a full layer's weight path: 7 matmuls + glue, separate vs fused
  5. lm_head int8 with/without fused final-norm

Methodology (axon tunnel: 3-5 ms dispatch latency): every variant loops
inside ONE jitted ``lax.fori_loop`` with a value dependency through the
carry — throughput, like the real decode while_loop.
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
    return float(np.asarray(x).ravel()[0])


def loop_time(make_body, init, iters=N):
    import jax

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, iters, make_body, carry)

    out = run(init)
    sync(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    out = run(init)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.models.layers import rms_norm
    from handwritten_ocr_tpu.models.quant import _quantize_linear

    assert jax.default_backend() != "cpu", "run on the chip"
    batch = int(np.asarray(24))
    key = jax.random.PRNGKey(0)
    d = 3584

    def dep(x, y):
        return x + y.sum().astype(x.dtype) * jnp.asarray(1e-30, x.dtype)

    def q(d_in, d_out, k):
        return _quantize_linear({"w": jax.random.normal(
            k, (d_in, d_out), jnp.float32) * 0.02})

    ks = jax.random.split(key, 16)
    wq, wk, wv = q(d, 3584, ks[0]), q(d, 512, ks[1]), q(d, 512, ks[2])
    wqkv = q(d, 3584 + 512 + 512, ks[3])
    wg, wu = q(d, 18944, ks[4]), q(d, 18944, ks[5])
    wgu = q(d, 2 * 18944, ks[6])
    wo = q(3584, d, ks[7])
    wd = q(18944, d, ks[8])
    g_ln = {"scale": jnp.ones((d,), jnp.bfloat16)}
    x0 = jax.random.normal(ks[9], (batch, d), jnp.bfloat16)

    def mm(w, x):
        return (x @ w["w_q"].astype(x.dtype)) * w["w_scale"].astype(x.dtype)

    print(f"== qkv: separate vs fused (batch {batch}) ==")

    def sep_qkv(i, x):
        a, b, c = mm(wq, x), mm(wk, x), mm(wv, x)
        return dep(x, a[:, :8] + b[:, :8] + c[:, :8])
    t_sep = loop_time(sep_qkv, x0)

    def fused_qkv(i, x):
        y = mm(wqkv, x)
        return dep(x, y[:, :8] + y[:, 3584:3592] + y[:, 4096:4104])
    t_fus = loop_time(fused_qkv, x0)
    floor = d * (3584 + 1024) / HBM
    print(f"  separate: {t_sep*1e6:7.1f} us ({100*floor/t_sep:5.1f}% SoL)")
    print(f"  fused   : {t_fus*1e6:7.1f} us ({100*floor/t_fus:5.1f}% SoL)"
          f"  delta {1e6*(t_sep-t_fus):+.1f} us")

    print("== gate/up: separate vs fused ==")

    def sep_gu(i, x):
        a, b = mm(wg, x), mm(wu, x)
        return dep(x, a[:, :8] + b[:, :8])
    t_sep = loop_time(sep_gu, x0)

    def fused_gu(i, x):
        y = mm(wgu, x)
        return dep(x, y[:, :8] + y[:, 18944:18952])
    t_fus = loop_time(fused_gu, x0)
    floor = d * 2 * 18944 / HBM
    print(f"  separate: {t_sep*1e6:7.1f} us ({100*floor/t_sep:5.1f}% SoL)")
    print(f"  fused   : {t_fus*1e6:7.1f} us ({100*floor/t_fus:5.1f}% SoL)"
          f"  delta {1e6*(t_sep-t_fus):+.1f} us")

    print("== full layer weight path (no attention): sep vs fused ==")

    def layer_sep(i, x):
        h = rms_norm(g_ln, x, 1e-6)
        a = mm(wq, h)[:, :3584]
        _k, _v = mm(wk, h), mm(wv, h)
        x = x + mm(wo, a + _k[:, :1].sum() * 0 + _v[:, :1].sum() * 0)
        h2 = rms_norm(g_ln, x, 1e-6)
        gate, up = mm(wg, h2), mm(wu, h2)
        x = x + mm(wd, jax.nn.silu(gate) * up)
        return x
    t_sep = loop_time(layer_sep, x0)

    def layer_fused(i, x):
        h = rms_norm(g_ln, x, 1e-6)
        y = mm(wqkv, h)
        a = y[:, :3584]
        x = x + mm(wo, a + y[:, 3584:3585].sum() * 0)
        h2 = rms_norm(g_ln, x, 1e-6)
        z = mm(wgu, h2)
        x = x + mm(wd, jax.nn.silu(z[:, :18944]) * z[:, 18944:])
        return x
    t_fus = loop_time(layer_fused, x0)
    per_layer_bytes = d * 4608 + 3584 * d + d * 2 * 18944 + 18944 * d
    floor = per_layer_bytes / HBM
    print(f"  separate: {t_sep*1e6:7.1f} us ({100*floor/t_sep:5.1f}% SoL)"
          f" -> x28 = {t_sep*28*1e3:.2f} ms")
    print(f"  fused   : {t_fus*1e6:7.1f} us ({100*floor/t_fus:5.1f}% SoL)"
          f" -> x28 = {t_fus*28*1e3:.2f} ms"
          f"  delta x28 {28e3*(t_sep-t_fus):+.2f} ms")

    print("== lm_head int8 (batch 24) ==")
    v = 152064
    wh = q(d, v, ks[10])

    def head(i, x):
        y = (x @ wh["w_q"].astype(x.dtype)).astype(jnp.float32) \
            * wh["w_scale"]
        return dep(x, y[:, :8].astype(x.dtype))
    t = loop_time(head, x0)

    def head_norm(i, x):
        h = rms_norm(g_ln, x, 1e-6)
        y = (h @ wh["w_q"].astype(h.dtype)).astype(jnp.float32) \
            * wh["w_scale"]
        return dep(x, y[:, :8].astype(x.dtype))
    t_n = loop_time(head_norm, x0)
    floor = d * v / HBM
    print(f"  head        : {t*1e3:6.3f} ms ({100*floor/t:5.1f}% SoL)")
    print(f"  norm + head : {t_n*1e3:6.3f} ms "
          f"(norm adds {1e6*(t_n-t):+.1f} us)")

    print("== glue-only: rmsnorm + rope-style elementwise, batch 24 ==")
    cos = jax.random.normal(ks[11], (batch, 1, 128), jnp.bfloat16)
    sin = jax.random.normal(ks[12], (batch, 1, 128), jnp.bfloat16)

    def glue(i, x):
        h = rms_norm(g_ln, x, 1e-6)
        qh = h[:, :28 * 128].reshape(batch, 28, 128)
        r1, r2 = jnp.split(qh, 2, axis=-1)
        rot = jnp.concatenate([-r2, r1], axis=-1)
        qh = qh * cos + rot * sin
        return dep(x, qh[:, 0, :8])
    t = loop_time(glue, x0)
    print(f"  norm+rope once: {t*1e6:6.1f} us -> x28x2 = "
          f"{t*56*1e3:.2f} ms/step if unfused")


if __name__ == "__main__":
    main()
