#!/usr/bin/env python3
"""Decode-glue microbenchmark at serving batch (24 slots, 7B dims).

Round-2 measurement: the decode step runs at ~68% of its HBM floor, and
the residue lives in the weight path (int8 widening + rmsnorm/rope/
lm_logits glue), not attention. This script isolates the candidate
fusions before any refactor:

  1. separate q/k/v int8 matmuls  vs  ONE fused [3584, 4608] matmul
  2. separate gate/up             vs  ONE fused [3584, 37888]
  3. a full layer's weight path: 7 matmuls + glue, separate vs fused
  4. lm_head int8 with/without fused final-norm
  5. rmsnorm+rope glue cost in isolation

Methodology (axon tunnel: 3-5 ms dispatch latency): every variant loops
inside ONE jitted ``lax.fori_loop`` with a value dependency through the
carry. Weights are passed as jit ARGUMENTS (closure capture would inline
multi-GB constants into the executable and blow up compile time).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

HBM = 819e9
N = 50


def sync(x):
    import jax
    jax.block_until_ready(x)   # no host transfer — tunnel pulls are slow
    return 0.0


def loop_time(body, init, ws, iters=N):
    """body(i, carry, ws) looped in one dispatch; ws passed as jit args."""
    import jax

    @jax.jit
    def run(carry, ws):
        return jax.lax.fori_loop(
            0, iters, lambda i, c: body(i, c, ws), carry)

    out = run(init, ws)
    sync(out[0] if isinstance(out, tuple) else out)
    start = time.perf_counter()
    out = run(init, ws)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - start) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from handwritten_ocr_tpu.models.layers import rms_norm
    from handwritten_ocr_tpu.models.quant import _quantize_linear

    assert jax.default_backend() != "cpu", "run on the chip"
    batch = 24
    key = jax.random.PRNGKey(0)
    d = 3584

    def dep(x, y):
        return x + y.sum().astype(x.dtype) * jnp.asarray(1e-30, x.dtype)

    def q(d_in, d_out, k):
        return _quantize_linear({"w": jax.random.normal(
            k, (d_in, d_out), jnp.float32) * 0.02})

    ks = jax.random.split(key, 16)
    W = {
        "q": q(d, 3584, ks[0]), "k": q(d, 512, ks[1]),
        "v": q(d, 512, ks[2]), "qkv": q(d, 3584 + 1024, ks[3]),
        "g": q(d, 18944, ks[4]), "u": q(d, 18944, ks[5]),
        "gu": q(d, 2 * 18944, ks[6]), "o": q(3584, d, ks[7]),
        "d": q(18944, d, ks[8]),
        "ln": {"scale": jnp.ones((d,), jnp.bfloat16)},
        "cos": jax.random.normal(ks[11], (batch, 1, 128), jnp.bfloat16),
        "sin": jax.random.normal(ks[12], (batch, 1, 128), jnp.bfloat16),
    }
    x0 = jax.random.normal(ks[9], (batch, d), jnp.bfloat16)

    def mm(w, x):
        return (x @ w["w_q"].astype(x.dtype)) * w["w_scale"].astype(x.dtype)

    print(f"== qkv: separate vs fused (batch {batch}) ==", flush=True)

    def sep_qkv(i, x, ws):
        a, b, c = mm(ws["q"], x), mm(ws["k"], x), mm(ws["v"], x)
        return dep(x, a[:, :8] + b[:, :8] + c[:, :8])
    t_sep = loop_time(sep_qkv, x0, W)

    def fused_qkv(i, x, ws):
        y = mm(ws["qkv"], x)
        return dep(x, y[:, :8] + y[:, 3584:3592] + y[:, 4096:4104])
    t_fus = loop_time(fused_qkv, x0, W)
    floor = d * (3584 + 1024) / HBM
    print(f"  separate: {t_sep*1e6:7.1f} us ({100*floor/t_sep:5.1f}% SoL)",
          flush=True)
    print(f"  fused   : {t_fus*1e6:7.1f} us ({100*floor/t_fus:5.1f}% SoL)"
          f"  delta {1e6*(t_sep-t_fus):+.1f} us", flush=True)

    print("== gate/up: separate vs fused ==", flush=True)

    def sep_gu(i, x, ws):
        a, b = mm(ws["g"], x), mm(ws["u"], x)
        return dep(x, a[:, :8] + b[:, :8])
    t_sep = loop_time(sep_gu, x0, W)

    def fused_gu(i, x, ws):
        y = mm(ws["gu"], x)
        return dep(x, y[:, :8] + y[:, 18944:18952])
    t_fus = loop_time(fused_gu, x0, W)
    floor = d * 2 * 18944 / HBM
    print(f"  separate: {t_sep*1e6:7.1f} us ({100*floor/t_sep:5.1f}% SoL)",
          flush=True)
    print(f"  fused   : {t_fus*1e6:7.1f} us ({100*floor/t_fus:5.1f}% SoL)"
          f"  delta {1e6*(t_sep-t_fus):+.1f} us", flush=True)

    print("== full layer weight path (no attention): sep vs fused ==",
          flush=True)

    def layer_sep(i, x, ws):
        h = rms_norm(ws["ln"], x, 1e-6)
        a = mm(ws["q"], h)
        _k, _v = mm(ws["k"], h), mm(ws["v"], h)
        x = x + mm(ws["o"], a + _k[:, :1].sum() * 0 + _v[:, :1].sum() * 0)
        h2 = rms_norm(ws["ln"], x, 1e-6)
        gate, up = mm(ws["g"], h2), mm(ws["u"], h2)
        x = x + mm(ws["d"], jax.nn.silu(gate) * up)
        return x
    t_sep = loop_time(layer_sep, x0, W)

    def layer_fused(i, x, ws):
        h = rms_norm(ws["ln"], x, 1e-6)
        y = mm(ws["qkv"], h)
        a = y[:, :3584]
        x = x + mm(ws["o"], a + y[:, 3584:3585].sum() * 0)
        h2 = rms_norm(ws["ln"], x, 1e-6)
        z = mm(ws["gu"], h2)
        x = x + mm(ws["d"], jax.nn.silu(z[:, :18944]) * z[:, 18944:])
        return x
    t_fus = loop_time(layer_fused, x0, W)
    per_layer_bytes = d * 4608 + 3584 * d + d * 2 * 18944 + 18944 * d
    floor = per_layer_bytes / HBM
    print(f"  separate: {t_sep*1e6:7.1f} us ({100*floor/t_sep:5.1f}% SoL)"
          f" -> x28 = {t_sep*28*1e3:.2f} ms", flush=True)
    print(f"  fused   : {t_fus*1e6:7.1f} us ({100*floor/t_fus:5.1f}% SoL)"
          f" -> x28 = {t_fus*28*1e3:.2f} ms"
          f"  delta x28 {28e3*(t_sep-t_fus):+.2f} ms", flush=True)

    print("== lm_head int8 (batch 24) ==", flush=True)
    v = 152064
    WH = {"h": q(d, v, ks[10]), "ln": W["ln"]}

    def head(i, x, ws):
        y = (x @ ws["h"]["w_q"].astype(x.dtype)).astype(jnp.float32) \
            * ws["h"]["w_scale"]
        return dep(x, y[:, :8].astype(x.dtype))
    t = loop_time(head, x0, WH)

    def head_norm(i, x, ws):
        h = rms_norm(ws["ln"], x, 1e-6)
        y = (h @ ws["h"]["w_q"].astype(h.dtype)).astype(jnp.float32) \
            * ws["h"]["w_scale"]
        return dep(x, y[:, :8].astype(x.dtype))
    t_n = loop_time(head_norm, x0, WH)
    floor = d * v / HBM
    print(f"  head        : {t*1e3:6.3f} ms ({100*floor/t:5.1f}% SoL)",
          flush=True)
    print(f"  norm + head : {t_n*1e3:6.3f} ms "
          f"(norm adds {1e6*(t_n-t):+.1f} us)", flush=True)

    print("== glue-only: rmsnorm + rope-style elementwise ==", flush=True)
    WG = {"ln": W["ln"], "cos": W["cos"], "sin": W["sin"]}

    def glue(i, x, ws):
        h = rms_norm(ws["ln"], x, 1e-6)
        qh = h[:, :28 * 128].reshape(batch, 28, 128)
        r1, r2 = jnp.split(qh, 2, axis=-1)
        rot = jnp.concatenate([-r2, r1], axis=-1)
        qh = qh * ws["cos"] + rot * ws["sin"]
        return dep(x, qh[:, 0, :8])
    t = loop_time(glue, x0, WG)
    print(f"  norm+rope once: {t*1e6:6.1f} us -> x28x2 = "
          f"{t*56*1e3:.2f} ms/step if unfused", flush=True)


if __name__ == "__main__":
    main()
