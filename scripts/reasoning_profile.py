#!/usr/bin/env python3
"""Reasoning-decode decomposition at 8B dims (round-5 verdict #4).

The 8B-class reasoning engine (4096h/36L, 32:8 GQA, int8) decodes at
~59.8% of its HBM floor while the 7B read path runs ~82%. This script
finds where the ~6.8 ms/step over floor goes, the same way
``glue_profile.py`` did for the 7B path: each candidate component loops
inside ONE jitted ``lax.fori_loop`` (the axon tunnel's 3-5 ms dispatch
latency would otherwise swamp microbenches), weights as jit args.

Sections:
  1. one decoder layer's WEIGHT path (qkv/o/mlp int8 matmuls + norms)
     at serving batch — ×36 + head = the weights-only step price.
  2. int8 lm_head (+ final norm) at batch 8.
  3. the fused paged append+attention kernel at the exact decode shapes
     (36 layers looped, the bench's context/table ladder) — kernel
     launch/grid overhead shows up here.
  4. embed gather + argmax sampling glue.

Compare the section sum to the measured step (BENCH_DETAIL
``reasoning_step_ms``) — the residue is scheduler/while_loop overhead.

Writes ``reasoning_profile.json`` at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

HBM = 819e9
N = 50

# 8B-class dims (bench.py reasoning_bench, the largest class a 16 GB
# chip serves in int8).
D, N_HEADS, N_KV, HD = 4096, 32, 8, 128
INTER, VOCAB, LAYERS = 12288, 151936, 36
BATCH = 8
PROMPT, BUDGET = 1024, 384          # bench workload -> mean ctx ~1216


def sync(x):
    """REAL queue drain: a 1-element d2h fetch. jax.block_until_ready
    does NOT synchronize on the axon tunnel (glue_profile's mistake —
    timings there measured dispatch, not execution)."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return 0.0


def loop_time(body, init, ws, iters=N):
    """Per-iteration time by DIFFERENCING two loop lengths (N and 3N):
    the d2h sync fetch costs a flat multi-ms on the axon tunnel, so a
    single-length measurement inflates short loops by pull/N."""
    import jax

    def make(n):
        @jax.jit
        def run(carry, ws):
            return jax.lax.fori_loop(0, n, lambda i, c: body(i, c, ws),
                                     carry)
        return run

    run1, run3 = make(iters), make(3 * iters)
    sync(run1(init, ws))          # compile
    sync(run3(init, ws))          # compile
    start = time.perf_counter()
    sync(run1(init, ws))
    t1 = time.perf_counter() - start
    start = time.perf_counter()
    sync(run3(init, ws))
    t3 = time.perf_counter() - start
    return max(t3 - t1, 1e-9) / (2 * iters)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    assert jax.default_backend() != "cpu", "run on the chip"

    from handwritten_ocr_tpu.models.layers import linear, rms_norm
    from handwritten_ocr_tpu.models.quant import _quantize_linear
    from handwritten_ocr_tpu.models.qwen25vl.language import lm_logits

    report: dict = {"dims": f"{D}h/{LAYERS}L {N_HEADS}:{N_KV} GQA int8",
                    "batch": BATCH}
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    def q(d_in, d_out, k):
        return _quantize_linear({"w": jax.random.normal(
            k, (d_in, d_out), jnp.float32) * 0.02})

    q_out = N_HEADS * HD
    kv_out = N_KV * HD
    # Production matmul path: models/layers.linear dispatches the Pallas
    # int8 kernel at decode lead dims (a raw x @ w_q.astype microbench
    # materializes widened weights and lands at ~30% SoL — not the op
    # the engine runs).
    W = {
        "q": q(D, q_out, ks[0]), "k": q(D, kv_out, ks[5]),
        "v": q(D, kv_out, ks[6]),
        "o": q(q_out, D, ks[1]),
        "g": q(D, INTER, ks[2]), "u": q(D, INTER, ks[3]),
        "d": q(INTER, D, ks[4]),
        "ln": {"scale": jnp.ones((D,), jnp.bfloat16)},
    }
    x0 = jax.random.normal(ks[9], (BATCH, D), jnp.bfloat16)

    def mm(w, x):
        return linear(w, x)

    # ── 1. layer weight path (separate q/k/v + gate/up, as production) ─
    def layer(i, x, ws):
        h = rms_norm(ws["ln"], x, 1e-6)
        a = mm(ws["q"], h)
        _k, _v = mm(ws["k"], h), mm(ws["v"], h)
        x = x + mm(ws["o"], a + _k[:, :1].sum() * 0 + _v[:, :1].sum() * 0)
        h2 = rms_norm(ws["ln"], x, 1e-6)
        gate, up = mm(ws["g"], h2), mm(ws["u"], h2)
        x = x + mm(ws["d"], jax.nn.silu(gate) * up)
        return x

    t_layer = loop_time(layer, x0, W)
    layer_bytes = (D * (q_out + 2 * kv_out) + q_out * D + 3 * D * INTER)
    layer_floor = layer_bytes / HBM
    report["layer_weight_path"] = {
        "us": round(t_layer * 1e6, 1),
        "sol_pct": round(100 * layer_floor / t_layer, 1),
        "x36_ms": round(t_layer * LAYERS * 1e3, 3),
        "floor_x36_ms": round(layer_floor * LAYERS * 1e3, 3),
    }
    print(f"layer weight path: {t_layer*1e6:.1f} us "
          f"({100*layer_floor/t_layer:.1f}% SoL) -> x{LAYERS} = "
          f"{t_layer*LAYERS*1e3:.2f} ms", flush=True)

    # ── 2. lm_head (production lm_logits: Pallas int8 head) ──────────
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config
    head_cfg = Qwen3Config(vocab_size=VOCAB, hidden_size=D,
                           intermediate_size=INTER,
                           num_hidden_layers=LAYERS,
                           num_attention_heads=N_HEADS,
                           num_key_value_heads=N_KV, head_dim=HD,
                           tie_word_embeddings=False)
    WH = {"lm_head": q(D, VOCAB, ks[10])}

    def head(i, x, ws):
        y = lm_logits(ws, head_cfg, x[:, None, :])
        nxt = jnp.argmax(y[:, -1], axis=-1)
        return x + nxt[:, None].astype(x.dtype) * jnp.asarray(1e-30, x.dtype)

    t_head = loop_time(head, x0, WH)
    head_floor = D * VOCAB / HBM
    report["lm_head_argmax"] = {
        "ms": round(t_head * 1e3, 3),
        "sol_pct": round(100 * head_floor / t_head, 1),
    }
    print(f"lm_head+argmax: {t_head*1e3:.3f} ms "
          f"({100*head_floor/t_head:.1f}% SoL)", flush=True)

    # ── 3. paged append+attention kernel at decode shapes ────────────
    from handwritten_ocr_tpu import config as cfg_mod
    from handwritten_ocr_tpu.ops.paged_decode_attention import (
        paged_append_attention)

    bs = cfg_mod.SERVE_BLOCK_SIZE
    ctx = PROMPT + BUDGET // 2
    width = ctx // bs + 2           # covers start+1 appended tokens
    n_blocks = BATCH * width + 1
    rng = np.random.default_rng(3)
    kq = jnp.asarray(rng.integers(-127, 127,
                     (LAYERS, n_blocks, bs, N_KV, HD)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 127,
                     (LAYERS, n_blocks, bs, N_KV, HD)), jnp.int8)
    kscale = jnp.asarray(
        rng.random((LAYERS, n_blocks, N_KV, bs), np.float32) * 0.02 + 0.01)
    vscale = jnp.asarray(
        rng.random((LAYERS, n_blocks, N_KV, bs), np.float32) * 0.02 + 0.01)
    tables = jnp.asarray(
        np.arange(1, 1 + BATCH * width).reshape(BATCH, width), jnp.int32)
    starts = jnp.full((BATCH,), ctx, jnp.int32)   # tokens already cached
    n_valid = jnp.ones((BATCH,), jnp.int32)
    qh = jax.random.normal(ks[11], (BATCH, 1, N_HEADS, HD), jnp.bfloat16)
    knew = jax.random.normal(ks[12], (BATCH, 1, N_KV, HD), jnp.bfloat16)
    vnew = jax.random.normal(ks[13], (BATCH, 1, N_KV, HD), jnp.bfloat16)

    KW = {"kq": kq, "vq": vq, "ks": kscale, "vs": vscale,
          "tables": tables, "q": qh, "k": knew, "v": vnew}

    def attn_all_layers(i, c, ws):
        # Pools ride the scan carry exactly like paged_forward — so XLA
        # aliases the in-place kernel updates instead of copying the
        # multi-GB pools per layer.
        def one_layer(carry, layer_idx):
            acc, kq_, vq_, ks_, vs_ = carry
            out, kq_, vq_, ks_, vs_ = paged_append_attention(
                ws["q"], ws["k"], ws["v"], kq_, vq_, ws["tables"],
                starts, n_valid, ks_, vs_, layer=layer_idx,
                scale=HD ** -0.5)
            acc = acc + out.sum().astype(acc.dtype) * \
                jnp.asarray(1e-30, acc.dtype)
            return (acc, kq_, vq_, ks_, vs_), None

        c, _ = jax.lax.scan(one_layer, c, jnp.arange(LAYERS))
        return c

    t_attn = loop_time(
        attn_all_layers,
        (jnp.zeros((), jnp.float32), kq, vq, kscale, vscale),
        KW, iters=10)
    kv_bytes = 2 * LAYERS * BATCH * width * bs * N_KV * HD  # int8 k+v pages
    attn_floor = kv_bytes / HBM
    report["paged_kernel_x36"] = {
        "ms": round(t_attn * 1e3, 3),
        "kv_read_floor_ms": round(attn_floor * 1e3, 3),
        "per_layer_us": round(t_attn / LAYERS * 1e6, 1),
        "ctx": ctx, "table_width": width,
    }
    print(f"paged kernel x{LAYERS}: {t_attn*1e3:.3f} ms "
          f"(KV floor {attn_floor*1e3:.3f} ms, "
          f"{t_attn/LAYERS*1e6:.0f} us/layer)", flush=True)

    # ── 4. embed gather + done-mask glue ─────────────────────────────
    WE = {"e": jax.random.normal(ks[14], (VOCAB, D), jnp.bfloat16)}

    def gather(i, c, ws):
        tok, acc = c
        emb = ws["e"][tok]
        tok = (tok + 1) % VOCAB
        return tok, acc + emb[:, :1].sum().astype(acc.dtype) * \
            jnp.asarray(1e-30, acc.dtype)

    t_gather = loop_time(
        gather, (jnp.zeros((BATCH,), jnp.int32), jnp.zeros((), jnp.bfloat16)),
        WE)
    report["embed_gather_us"] = round(t_gather * 1e6, 1)
    print(f"embed gather: {t_gather*1e6:.1f} us", flush=True)

    # ── decomposition ────────────────────────────────────────────────
    total = t_layer * LAYERS + t_head + t_attn + t_gather
    floor = layer_floor * LAYERS + head_floor + attn_floor
    report["component_sum_ms"] = round(total * 1e3, 3)
    report["floor_ms"] = round(floor * 1e3, 3)
    detail_file = Path(__file__).parent.parent / "BENCH_DETAIL.json"
    measured = None
    try:
        measured = json.loads(detail_file.read_text())["reasoning"][
            "reasoning_step_ms"]
        report["measured_step_ms"] = measured
        report["residue_ms"] = round(measured - total * 1e3, 3)
    except (OSError, KeyError, json.JSONDecodeError):
        pass
    print(f"\ncomponent sum {total*1e3:.2f} ms vs floor {floor*1e3:.2f} ms"
          + (f" vs measured step {measured} ms" if measured else ""),
          flush=True)
    (Path(__file__).parent.parent / "reasoning_profile.json").write_text(
        json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
