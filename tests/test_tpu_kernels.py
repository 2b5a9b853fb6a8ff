"""On-chip kernel checks (``pytest -m tpu``).

The CPU suite guards the portable fallbacks; these tests guard the Pallas
kernels' behavior on real TPU hardware — the round-2 gap where on-chip
kernel parity lived only in hand-run ``scripts/tpu_paged_check.py``.

Run on the bench chip with::

    HOCR_TEST_TPU=1 python -m pytest tests/ -m tpu -q

(``HOCR_TEST_TPU=1`` stops conftest.py from forcing the CPU backend.)
Everything here skips automatically when no TPU is present, so the
default CPU suite is unaffected.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))


def _require_tpu():
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("TPU backend not available (run with HOCR_TEST_TPU=1 "
                    "on a TPU host)")


@pytest.fixture(autouse=True)
def _drain_tpu_queue():
    """Free the previous test's model between tests. Two leaks stack:
    (1) jit-of-method caches key on the STATIC ``self`` (VLModel /
    PagedProgram), which holds the multi-GB param tree — the global jit
    cache keeps it alive forever, so two whole-model gauntlets cannot
    share a process without clearing; (2) jax.block_until_ready does
    not synchronize on the axon tunnel, so frees ride the queue until
    a real d2h fetch drains it."""
    yield
    import gc

    import jax
    import jax.numpy as jnp
    if jax.default_backend() == "tpu":
        jax.clear_caches()
        gc.collect()
        np.asarray(jnp.zeros((1,)))


@pytest.mark.parametrize("t", [1, 9])
def test_paged_kernel_numeric_bound(t):
    """Fused append+attention kernel vs an fp32 gather+softmax reference:
    appends land bit-exactly and attention stays inside bf16 accumulation
    noise. An indexing bug produces O(1) errors, not O(1e-3)."""
    _require_tpu()
    import tpu_paged_check
    bound = tpu_paged_check.direct_numeric_bound(t)
    assert bound < 0.02, f"kernel numeric bound blown: {bound}"


@pytest.mark.parametrize("dtype_name", ["f32", "bf16"])
def test_paged_kernel_vs_gather_decode(dtype_name):
    """Kernel-path decode vs the portable gather path end to end. Exact
    equality is NOT expected (online softmax reassociates accumulation;
    random-weight logits sit in near-ties) — require strong agreement."""
    _require_tpu()
    import os

    import tpu_paged_check
    os.environ.pop("HOCR_TPU_PAGED", None)
    kernel_tokens = tpu_paged_check.run(dtype_name)
    os.environ["HOCR_TPU_PAGED"] = "0"
    try:
        gather_tokens = tpu_paged_check.run(dtype_name)
    finally:
        os.environ.pop("HOCR_TPU_PAGED", None)
    agrees = [sum(x == y for x, y in zip(a, b)) / max(len(a), len(b), 1)
              for a, b in zip(kernel_tokens, gather_tokens)]
    assert float(np.mean(agrees)) >= 0.8, agrees


def test_int8_kv_serving_on_chip():
    """int8-KV on the production block size (128), DETERMINISTIC: the
    quantize-on-append / dequantize-in-score-space kernel's attention
    output must sit inside the int8 error bound of the fp-KV kernel on
    IDENTICAL cache content. (The old token-agreement form compared two
    greedy decodes of a random-weight model — near-tie flips made it an
    RNG lottery.) A serving smoke run still proves the batcher path
    compiles and completes with kv_quant on."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.ops.paged_decode_attention import (
        paged_append_attention)

    rng = np.random.default_rng(7)
    s, t, hq, hkv, d = 4, 9, 8, 4, 128
    n_layers, n_blocks, bs, width = 2, 12, 128, 3
    layer = 1
    q = jnp.asarray(rng.standard_normal((s, t, hq, d)) * 0.5, jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((s, t, hkv, d)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((s, t, hkv, d)), jnp.bfloat16)
    tables = jnp.asarray(
        rng.permutation(np.arange(1, 1 + s * width)).reshape(s, width),
        jnp.int32)
    start = jnp.asarray([17, 120, 0, 64], jnp.int32)
    n_valid = jnp.asarray([t, t, t, 0], jnp.int32)

    history = rng.standard_normal(
        (n_layers, n_blocks, bs, hkv, d)).astype(np.float32)
    k_pool = jnp.asarray(history, jnp.bfloat16)
    v_pool = jnp.asarray(history[::-1], jnp.bfloat16)

    def quantize_pool(pool):
        f = np.asarray(pool, np.float32)
        scales = np.maximum(np.abs(f).max(axis=-1), 1e-6) / 127.0
        q8 = np.round(f / scales[..., None]).astype(np.int8)
        # data [L, N, BS, H, D]; scale pool layout [L, N, H, BS]
        return jnp.asarray(q8), jnp.asarray(
            scales.transpose(0, 1, 3, 2), jnp.float32)

    kq_pool, ks_pool = quantize_pool(k_pool)
    vq_pool, vs_pool = quantize_pool(v_pool)

    out_fp, *_ = paged_append_attention(
        q, k_new, v_new, k_pool, v_pool, tables, start, n_valid,
        layer=layer, scale=d ** -0.5)
    out_q, *_ = paged_append_attention(
        q, k_new, v_new, kq_pool, vq_pool, tables, start, n_valid,
        ks_pool, vs_pool, layer=layer, scale=d ** -0.5)

    fp = np.asarray(out_fp, np.float32)
    qv = np.asarray(out_q, np.float32)
    live = np.asarray(n_valid) > 0
    err = np.abs(fp - qv)[live].max()
    assert float(err) < 0.06, f"int8-KV output error {err}"
    assert float(np.abs(fp[live]).max()) > 0.05   # outputs are non-trivial

    # Serving smoke: the full batcher path with kv_quant compiles + runs.
    from handwritten_ocr_tpu.engine.serving import (
        ContinuousBatcher, GenRequest, PagedProgram)
    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config

    cfg = Qwen3Config(vocab_size=2048, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=4,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=128, eos_token_id=0, pad_token_id=0)
    params = init_qwen3(jax.random.PRNGKey(21), cfg, dtype=jnp.bfloat16)
    batcher = ContinuousBatcher(PagedProgram(params, cfg), n_slots=4,
                                block_size=128, max_context=256, chunk=8,
                                prefill_bucket=32, dtype=jnp.bfloat16,
                                kv_quant=True)
    out = batcher.run([GenRequest(np.asarray(
        np.random.default_rng(5).integers(1, 2000, size=n), np.int32), 24)
        for n in (6, 17, 29, 11)])
    assert all(len(tokens) == 24 for tokens in out)


@pytest.mark.parametrize("packed", [True, False])
@pytest.mark.parametrize("dtype_name", ["bf16", "f32"])
def test_window_attention_on_chip(dtype_name, packed):
    """Fused multi-window kernel at the FLAGSHIP grid (n_win=54, L=64,
    D=1280 — the bench shapes) in both dtypes and both layouts. The f32
    packed case is the exact round-3 bench crash (scoped-VMEM OOM from a
    rows-only chunk cap tuned at bf16); byte-based budgets must compile
    it. Numerics checked against the einsum fallback."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.ops.window_attention import window_attention

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    num_heads, hd, b = 16, 80, 2
    n_win, window_len = 54, 64
    d = num_heads * hd
    p = n_win * window_len
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 3)
    qkv = (jax.random.normal(ks[0], (b, p, 3 * d), jnp.float32)
           .astype(dtype))
    cos = jnp.cos(jax.random.normal(ks[1], (p, hd), jnp.float32))
    sin = jnp.sin(jax.random.normal(ks[2], (p, hd), jnp.float32))
    valid = np.ones(p, bool)
    valid[-window_len + 5:] = False          # ragged tail window
    valid = jnp.asarray(valid)

    got = np.asarray(window_attention(
        qkv, cos, sin, valid, num_heads=num_heads, window_len=window_len,
        scale=hd ** -0.5, packed=packed), np.float32)

    # fp32 einsum reference (same math as vision._attend_windows fallback)
    from handwritten_ocr_tpu.models.layers import apply_rope
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    shape = (b, n_win, window_len, num_heads, hd)
    q, k, v = q.reshape(shape), k.reshape(shape), v.reshape(shape)
    cos_w = cos.reshape(n_win, window_len, -1)[None, :, :, None, :]
    sin_w = sin.reshape(n_win, window_len, -1)[None, :, :, None, :]
    q, k = apply_rope(q, k, cos_w, sin_w)
    scores = jnp.einsum("bwthd,bwshd->bwhts", q, k) * hd ** -0.5
    mask = valid.reshape(n_win, window_len)[None, :, None, None, :]
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(scores, axis=-1)
    ref = np.asarray(jnp.einsum("bwhts,bwshd->bwthd", weights, v)
                     .reshape(b, p, d), np.float32)
    tol = 0.03 if dtype_name == "bf16" else 2e-4
    err = np.abs(got - ref)[:, np.asarray(valid)].max()
    assert float(err) < tol, f"window kernel error {err} at {dtype_name}"


def _run_phase_subprocess(phase: str, env_extra: dict, timeout: float):
    """Run one bench phase in its OWN process (bench.py's run_phase
    machinery) and return (result, wall_s).

    Round-4 verdict #2: the whole-model gauntlets cannot share one
    process with the kernel tests — live buffers accumulate across tests
    on the ~13 GB chip and the LAST gauntlets die RESOURCE_EXHAUSTED
    even though each passes solo. Process exit is the only HBM free the
    axon tunnel honors unconditionally, and the bench phases are
    subprocess-shaped anyway, so each gauntlet runs exactly what the
    driver's bench runs, isolated the same way."""
    import json
    import os
    import subprocess
    import tempfile
    import time

    repo = Path(__file__).parent.parent
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        out_path = f.name
    env = dict(os.environ, HOCR_BENCH_PHASE=phase,
               HOCR_BENCH_OUT=out_path, **env_extra)
    start = time.monotonic()
    proc = subprocess.run(
        [sys.executable, str(repo / "bench.py")], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=timeout)
    wall = time.monotonic() - start
    assert proc.returncode == 0, (
        f"phase {phase} subprocess rc={proc.returncode}\n"
        + proc.stdout.decode(errors="replace")[-3000:])
    result = json.loads(Path(out_path).read_text())
    os.unlink(out_path)
    assert result.get("backend") == "tpu", result.get("backend")
    return result, wall


def test_flagship_compile_gauntlet():
    """Compile-and-run the EXACT production bench read phase at the
    bench grid (24 pages, 7B dims, int8, production dtype path):
    preprocess+pack, vision prompt_embeds, paged prefill, and the
    throughput decode chunk. Round 3 shipped a kernel that only the
    driver's bench could catch — this test fails first now. Decode
    budgets are tiny so the run costs seconds once compiled; compiles
    are the point. Runs as a subprocess for HBM isolation."""
    _require_tpu()
    result, _ = _run_phase_subprocess(
        "read", {"HOCR_BENCH_DECODE": "16", "HOCR_BENCH_ITERS": "1"},
        timeout=1800)
    metrics = result["read"]
    assert metrics["pages_run"] == 24
    assert metrics["total_tokens"] > 0
    assert result["quant"] == "int8"


def test_flash_attention_kernel_on_chip():
    """Pallas flash-attention (prefill path) vs the XLA reference on
    chip — the CPU suite only exercises interpret mode."""
    _require_tpu()
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(3)
    b, s, hq, hkv, d = 2, 512, 8, 4, 128
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)

    got = np.asarray(flash_attention(q, k, v, causal=True), np.float32)

    qf = np.asarray(q, np.float32).reshape(b, s, hkv, hq // hkv, d)
    kf, vf = np.asarray(k, np.float32), np.asarray(v, np.float32)
    scores = np.einsum("bshgd,bthd->bhgst", qf, kf) * d ** -0.5
    mask = np.tril(np.ones((s, s), bool))
    scores = np.where(mask[None, None, None], scores, -1e30)
    weights = np.exp(scores - scores.max(-1, keepdims=True))
    weights /= weights.sum(-1, keepdims=True)
    ref = np.einsum("bhgst,bthd->bshgd", weights, vf).reshape(b, s, hq, d)
    assert float(np.abs(got - ref).max()) < 0.03


def test_reasoning_compile_gauntlet():
    """Compile-and-run the EXACT 8B-class reasoning bench programs
    (bench.py reasoning phase: paged prefill at prompt 1024, plain
    chunked decode, speculative verify block, schema-guided agent batch)
    with a tiny decode budget — compiles are the point. Round 4's bench
    died cold-compiling this phase; it must fail red here first, inside
    a wall-clock bound derived from the bench's phase budget. Runs as a
    subprocess for HBM isolation (round-4 verdict #2)."""
    _require_tpu()
    import bench

    result, wall = _run_phase_subprocess(
        "reasoning", {"HOCR_REASONING_BUDGET": "24"},
        timeout=bench.PHASE_ESTIMATES_S["reasoning"] * 8)
    reasoning = result["reasoning"]
    assert reasoning["model_class"].startswith("qwen3-8B")
    assert reasoning["reasoning_tokens_per_sec"] > 0
    assert reasoning["guided_complete"] >= 0
    assert wall < bench.PHASE_ESTIMATES_S["reasoning"] * 4, (
        f"reasoning gauntlet took {wall:.0f}s — the bench phase budget "
        f"({bench.PHASE_ESTIMATES_S['reasoning']}s warm estimate) is "
        "unrealistic; re-measure or cut compile cost")


def test_spec_train_compile_gauntlet():
    """Compile-and-run the trained-speculation bench phase (train step +
    batcher programs at the LM-phase scale) with the train loop capped
    to 2 steps — every program the spec phase compiles, in bounded
    wall-clock. Subprocess-isolated; HOCR_TRAIN_STEPS is read at call
    time inside the phase (round-4 advisor finding)."""
    _require_tpu()
    import bench

    result, wall = _run_phase_subprocess(
        "spec", {"HOCR_TRAIN_STEPS": "2"},
        timeout=bench.PHASE_ESTIMATES_S["spec"] * 8)
    spec = result["speculation_trained"]
    assert spec["train_steps"] == 2
    assert "net_speedup" in spec
    assert wall < bench.PHASE_ESTIMATES_S["spec"] * 4, (
        f"spec gauntlet took {wall:.0f}s vs phase estimate "
        f"{bench.PHASE_ESTIMATES_S['spec']}s")


def test_pipeline_compile_gauntlet():
    """Compile-and-run the pipeline-latency bench programs (full agentic
    loop: flagship read -> schema-constrained critic/editor). The 7B
    init + compile dominates; the run itself is seconds. Subprocess-
    isolated like every whole-model gauntlet."""
    _require_tpu()
    import bench

    result, wall = _run_phase_subprocess(
        "pipeline", {}, timeout=bench.PHASE_ESTIMATES_S["pipeline"] * 8)
    pipeline = result["pipeline"]
    assert pipeline["pages"] == 4
    assert pipeline["p50_page_latency_reduced_s"] > 0
    assert wall < bench.PHASE_ESTIMATES_S["pipeline"] * 4, (
        f"pipeline gauntlet took {wall:.0f}s vs phase estimate "
        f"{bench.PHASE_ESTIMATES_S['pipeline']}s")
