#!/usr/bin/env python3
"""Live cross-check of the flagship projection's 32B TP8 step price.

bench.py projects the qwen3:32b reasoning step (ref config.py:16) as
``analytic HBM floor / measured 8B SoL fraction``. Round-3 verdict #8:
sanity-check that analytic term against a LIVE decode measurement at 32B
*widths* (hidden 5120 / inter 25600 / 64:8 GQA / vocab 151936 — Qwen3-32B
dims), which fits one 16 GiB chip in int8 at reduced depth.

Method: measure the production paged decode step at two depths (4 and 8
layers, identical widths, batch 8, ctx ~3072, int8 weights + int8 KV).
The depth slope isolates the per-layer step price (weights + KV reads);
the intercept is the depth-independent overhead (lm_head read + embed
gather + dispatch glue). Under TP8 every chip holds all 64 layers at 1/8
width and 1/8 of the KV heads, so

    step_32b_tp8 ≈ (64/8) · slope + intercept/8

(the lm_head is column-sharded 1/8 per chip; per-chip efficiency is
assumed equal to this chip's — the same assumption the projection makes,
which is exactly what this cross-check validates). Writes
step32_check.json at the repo root; bench.py folds the result into
``flagship_projection.projection_terms.step_32b_tp8_ms_measured``.

Usage: python scripts/step32_check.py   (TPU; ~2-4 min incl. compiles)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

OUT = Path(__file__).parent.parent / "step32_check.json"


def measure_depth(layers: int) -> dict:
    import jax
    import jax.numpy as jnp

    from bench import _StageTimer
    from handwritten_ocr_tpu import config as cfg_mod
    from handwritten_ocr_tpu.engine.serving import (ContinuousBatcher,
                                                    GenRequest, PagedProgram)
    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config

    cfg = Qwen3Config(vocab_size=151936, hidden_size=5120,
                      intermediate_size=25600, num_hidden_layers=layers,
                      num_attention_heads=64, num_key_value_heads=8,
                      head_dim=128, eos_token_id=-1)
    batch, prompt_len, budget = 8, 3072, 96
    params = init_qwen3(jax.random.PRNGKey(3), cfg, dtype=jnp.bfloat16,
                        quantize="int8")
    program = PagedProgram(params, cfg, eos_token_id=-1)
    timer = _StageTimer()
    program.decode_chunk = timer.wrap("decode", program.decode_chunk)

    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, prompt_len).astype(np.int32)
               for _ in range(batch)]

    def run():
        batcher = ContinuousBatcher(
            program, n_slots=batch, block_size=cfg_mod.SERVE_BLOCK_SIZE,
            max_context=prompt_len + budget + 64, chunk=cfg_mod.SERVE_CHUNK,
            throughput_chunk=cfg_mod.SERVE_THROUGHPUT_CHUNK,
            dtype=jnp.bfloat16, kv_quant=True)
        batcher.run([GenRequest(p, budget) for p in prompts])

    run()                                      # compile + warm
    timer.reset()
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    steps = timer.calls.get("decode", 0) * cfg_mod.SERVE_THROUGHPUT_CHUNK
    step_ms = timer.seconds.get("decode", wall) / max(steps, 1) * 1e3
    del params, program
    jax.clear_caches()
    import gc
    gc.collect()
    return {"layers": layers, "step_ms": round(step_ms, 3),
            "decode_steps": steps, "wall_s": round(wall, 1)}


def _measure_subprocess(layers: int) -> dict:
    """One depth per PROCESS: HBM freed by a dead process cannot
    fragment the next depth's pool (the in-process sequence OOMed at
    the 8-layer init even after del + clear_caches + gc — same lesson
    as bench.py's phase isolation)."""
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        out_path = f.name
    env = dict(os.environ, STEP32_LAYERS=str(layers), STEP32_OUT=out_path)
    code = subprocess.call([sys.executable, __file__], env=env)
    if code != 0:
        raise SystemExit(f"step32 depth-{layers} subprocess rc={code}")
    result = json.loads(Path(out_path).read_text())
    os.unlink(out_path)
    return result


def main() -> None:
    layers_env = os.environ.get("STEP32_LAYERS")
    import jax
    cache_dir = Path(__file__).parent.parent / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    if jax.default_backend() != "tpu":
        raise SystemExit("step32_check needs the TPU (widths OOM host RAM)")

    if layers_env:                    # subprocess: one depth, write, exit
        result = measure_depth(int(layers_env))
        Path(os.environ["STEP32_OUT"]).write_text(json.dumps(result))
        return

    d4 = _measure_subprocess(4)
    print(f"[step32] 4L: {d4['step_ms']} ms/step", flush=True)
    d8 = _measure_subprocess(8)
    print(f"[step32] 8L: {d8['step_ms']} ms/step", flush=True)

    slope = (d8["step_ms"] - d4["step_ms"]) / 4          # ms per layer
    intercept = d8["step_ms"] - 8 * slope                # lm_head+embed+glue
    step32_tp8 = (64 / 8) * slope + intercept / 8

    report = {
        "what": "live 32B-width paged decode at depths 4/8 (int8 W, int8 "
                "KV, batch 8, ctx 3072) -> per-layer slope + fixed "
                "intercept -> TP8 per-chip step price",
        "depth4": d4, "depth8": d8,
        "per_layer_slope_ms": round(slope, 4),
        "intercept_ms": round(intercept, 4),
        "step_32b_tp8_ms_measured": round(step32_tp8, 3),
    }
    OUT.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
