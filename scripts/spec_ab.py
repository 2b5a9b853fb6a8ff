#!/usr/bin/env python3
"""Speculative-decode A/B on the chip: editor-style copy-heavy prompts.

The editor agent returns the whole corrected transcription — its output
is largely a verbatim copy of the prompt, which is exactly the regime
prompt-lookup drafting exploits. Random init weights do NOT copy (no
induction heads), so this script reports three numbers on the
serving-grade 7B text decoder:

  plain   — continuous-batched greedy decode, no speculation.
  ngram   — speculation enabled with the real n-gram drafter. On random
            weights acceptance is ~0 and the gate falls back to plain
            chunks, so this measures the OVERHEAD of having speculation
            on for a workload it can't help (greedy output asserted
            identical to plain).
  timing  — verify-dispatch vs step-dispatch time, from which the
            realized speedup at any acceptance rate follows:
            (1 + accepted) * t_step / t_verify.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from handwritten_ocr_tpu.models.init import init_qwen3
from handwritten_ocr_tpu.models.qwen3 import Qwen3Config
from handwritten_ocr_tpu.engine.serving import (ContinuousBatcher,
                                                GenRequest, PagedProgram)

text_cfg = Qwen3Config(vocab_size=152064, hidden_size=3584,
                       intermediate_size=18944, num_hidden_layers=28,
                       num_attention_heads=28, num_key_value_heads=4,
                       head_dim=128)
params = init_qwen3(jax.random.PRNGKey(0), text_cfg, dtype=jnp.bfloat16,
                    quantize="int8")
rng = np.random.default_rng(0)
period = rng.integers(1, 150000, size=24)
prompts = [np.tile(period, 20).astype(np.int32) for _ in range(8)]  # 480 tok
BUDGET = 256

# ONE program for every run: the jit cache is keyed on the instance
# (static argnum 0) — a fresh program per run would recompile/reload.
program = PagedProgram(params, text_cfg, eos_token_id=-1)


def run(speculate: bool):
    batcher = ContinuousBatcher(program, n_slots=8, block_size=64,
                                max_context=480 + BUDGET + 64, chunk=16,
                                dtype=jnp.bfloat16)
    reqs = [GenRequest(p, BUDGET, speculate=speculate) for p in prompts]
    t0 = time.perf_counter()
    out = batcher.run(reqs)
    dt = time.perf_counter() - t0
    return out, dt, dict(batcher.spec_stats)


out_plain, _, _ = run(False)                  # warm: compile/load programs
out_plain, t_plain, _ = run(False)
out_ngram, _, _ = run(True)                   # warm the verify program
out_ngram, t_ngram, ngram_stats = run(True)
assert out_ngram == out_plain, "ngram speculation changed greedy output!"

# Dispatch economics: time the verify forward (t = K+1 virtual rows
# through the SAME paged-attention kernel as a step) against the plain
# decode step at the serving context. Random init weights cannot
# demonstrate real acceptance (no induction heads -> drafts never match;
# tiled prompts put every logit in a degenerate near-tie), so the
# realized speedup is computed from these dispatch times:
#   speedup(A) = (1 + A) * t_step / t_verify   for A accepted/round.
# Acceptance mechanics are covered bit-exactly by tests/test_serving.py
# (tiny model, CPU) and by the TPU probe: 27/28 aperiodic draft
# positions accept; editor-copy workloads draft near-perfectly.
from collections import deque
K = 16
batcher = ContinuousBatcher(program, n_slots=8, block_size=64,
                            max_context=480 + BUDGET + 64, chunk=16,
                            dtype=jnp.bfloat16)
batcher._prefill_admitted(batcher._try_admit(
    deque(GenRequest(p, BUDGET) for p in prompts)))
cache = batcher.cache
last = jnp.asarray(batcher._last)
rd = jnp.asarray(batcher._rope_delta)
active = jnp.ones((8,), bool)
drafts = jnp.asarray(rng.integers(1, 150000, size=(8, K)), jnp.int32)
dlen = jnp.full((8,), K, jnp.int32)

toks, acc, cache = program.verify_step(cache, last, drafts, dlen, active, rd)
jax.block_until_ready(toks)
t0 = time.perf_counter()
for _ in range(20):
    toks, acc, cache = program.verify_step(cache, last, drafts, dlen,
                                           active, rd)
jax.block_until_ready(toks)
t_verify = (time.perf_counter() - t0) / 20

batcher2 = ContinuousBatcher(program, n_slots=8, block_size=64,
                             max_context=480 + BUDGET + 64, chunk=16,
                             dtype=jnp.bfloat16)
batcher2._prefill_admitted(batcher2._try_admit(
    deque(GenRequest(p, BUDGET) for p in prompts)))
cache2 = batcher2.cache
ids, _, cache2 = program.step_topk(cache2, last, rd, 4, active=active)
jax.block_until_ready(ids)
t0 = time.perf_counter()
for _ in range(20):
    ids, _, cache2 = program.step_topk(cache2, last, rd, 4, active=active)
jax.block_until_ready(ids)
t_step = (time.perf_counter() - t0) / 20

total = sum(len(t) for t in out_plain)
print(f"plain : {t_plain:.2f}s ({total/t_plain:.0f} tok/s)")
print(f"ngram : {t_ngram:.2f}s ({total/t_ngram:.0f} tok/s)  "
      f"rounds={ngram_stats['rounds']} drafted={ngram_stats['drafted']} "
      f"accepted={ngram_stats['accepted']}  "
      f"overhead={t_ngram/t_plain - 1:+.1%}")
print(f"plain==ngram: {out_ngram == out_plain}")
print(f"t_step={t_step*1e3:.2f}ms  t_verify(K={K})={t_verify*1e3:.2f}ms  "
      f"ratio={t_verify/t_step:.2f}")
for a in (4, 8, 12, 16):
    print(f"  speedup at {a:2d} accepted/round: "
          f"{(1 + a) * t_step / t_verify:.2f}x")
