#!/usr/bin/env python3
"""MEASURED full-contract per-page pipeline latency (round-5 verdict #3).

Every prior per-page number was either a reduced-budget plumbing run
(96-token agents) or a projection composed from stage measurements. This
script measures the reference's FULL token contract end to end on the
chip, through the production engines and the production graph driver:

  * read: 7B flagship dims (olmOCR-2 class), int8, TWO strategy reads
    per page decoded to the full 2,048-token budget (ref config.py:19)
    through ``JaxOCRBackend.read_batch`` — the batched read the driver
    runs (driver.py:135-201).
  * agents: 8B-class reasoning dims (4096h/36L — the largest class one
    16 GB chip serves in int8), schema-constrained critic/editor calls
    at the 4,096-token agent cap (ref config.py:10) through the real
    ``OCRPipeline`` loop with the MEDIAN iteration structure (critic →
    editor → critic → accept; the structure the flagship projection
    prices).

Two engine processes, because the 16 GB chip cannot hold the 7B VLM and
the 8B reasoning engine at once — the same physical constraint that
makes the REFERENCE load/unload engines around every phase on its single
48 GB device (ref tools.py:714-725, nodes.py:125-127). The read process
measures and persists per-page transcripts + walls; the agent process
replays those transcripts through the graph driver (its OCR node costs
~0) and measures the agent walls. Per-page latency = read wall + agent
wall; the 8B engine's init wall is reported separately as the
swap/residency cost (a 2-chip deployment keeps both engines resident
and never pays it).

Honesty notes, recorded in the artifact:
  * Weights are random; throughput is weight-value-independent, and
    every token of the contract budget is actually decoded (random
    weights never emit EOS, which IS the contract-ceiling length; the
    "typical" mode caps agent calls at the projection's typical lengths
    — 704-token critic JSON, 896-token editor page — to emulate EOS on
    a real page).
  * The critic's verdict fields are overridden AFTER full generation to
    pin the median structure (random-weight JSON would route
    arbitrarily); the engine work per call is untouched.

Usage (on the bench chip):
    python scripts/pipeline_contract.py            # full run, ~20 min
    HOCR_CONTRACT_PAGES=2 python scripts/pipeline_contract.py  # quicker

Writes ``pipeline_contract.json`` at the repo root and merges the
summary into BENCH_DETAIL.json under ``pipeline_contract`` with live
provenance.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

N_PAGES = int(os.environ.get("HOCR_CONTRACT_PAGES", "5"))
N_CEILING_PAGES = min(2, N_PAGES)
READ_BUDGET = 2048            # ref config.py:19
AGENT_CAP = 4096              # ref config.py:10
TYPICAL_CAPS = {"critic": 704, "editor": 896}   # projection's typical mix


def _setup_jax():
    import bench
    return bench._setup_jax()


def _pages_to_disk(tmp: Path, n: int) -> list[str]:
    import bench
    from PIL import Image
    tmp.mkdir(parents=True, exist_ok=True)
    paths = []
    for index, page in enumerate(bench.synthetic_pages(n)):
        path = tmp / f"page{index}.png"
        Image.fromarray(page).save(path)
        paths.append(str(path))
    return paths


def phase_read(out_path: str) -> None:
    """7B engine process: per-page 2-strategy read at the full budget."""
    jax = _setup_jax()
    import bench
    import jax.numpy as jnp

    from handwritten_ocr_tpu import config as cfg_mod
    from handwritten_ocr_tpu.engine.jax_engines import (JaxOCRBackend,
                                                        TPUPreprocessor)
    from handwritten_ocr_tpu.models.init import init_vl
    from handwritten_ocr_tpu.models.processor import ByteTokenizer
    from handwritten_ocr_tpu.models.qwen25vl.model import VLModel

    assert jax.default_backend() == "tpu", "contract run needs the chip"
    cfg = bench.build_config("7b")
    t0 = time.perf_counter()
    params = init_vl(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                     quantize="int8")
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0
    backend = JaxOCRBackend(VLModel(params, cfg), ByteTokenizer())
    prep = TPUPreprocessor()
    paths = _pages_to_disk(REPO / ".contract_pages", N_PAGES)
    strategies = cfg_mod.PREPROCESSING_STRATEGIES[:2]

    def read_page(path: str):
        prepared = [prep.apply(path, strat) for strat in strategies]
        start = time.perf_counter()
        texts = backend.read_batch(prepared, cfg_mod.OCR_PROMPT, READ_BUDGET)
        return texts, time.perf_counter() - start

    print("[contract-read] warm (compiles all programs)...", flush=True)
    t0 = time.perf_counter()
    read_page(paths[0])
    warm_s = time.perf_counter() - t0
    pages = []
    for path in paths:
        texts, wall = read_page(path)
        pages.append({"path": path, "wall_s": round(wall, 3),
                      "texts": texts,
                      "chars": [len(t) for t in texts]})
        print(f"[contract-read] {Path(path).name}: {wall:.1f}s "
              f"chars={[len(t) for t in texts]}", flush=True)
    Path(out_path).write_text(json.dumps({
        "init_s": round(init_s, 1), "warm_s": round(warm_s, 1),
        "read_budget": READ_BUDGET, "strategies": 2, "pages": pages,
    }))


def _synthetic_page_text(index: int, n_chars: int = 2048) -> str:
    """Deterministic page-length transcript for the agent prompts.

    The read process decodes the REAL 2,048-token budget (its wall is
    the timed quantity), but random-weight tokens mostly fall outside
    the byte tokenizer's decodable range, so its text is a few chars —
    useless as a critic/editor prompt. The agent phase instead carries
    a synthetic 2,048-char page (1 char = 1 byte-token: the prompt
    costs the same token count the read produced), preserving the
    contract's prompt-length economics."""
    rng = np.random.default_rng(100 + index)
    words = []
    total = 0
    while total < n_chars:
        length = int(rng.integers(3, 9))
        word = "".join(chr(97 + c) for c in rng.integers(0, 26, length))
        words.append(word)
        total += length + 1
    return " ".join(words)[:n_chars]


class _ReplayOCR:
    """Replays the read phase: same text for every strategy (agreement
    100 -> no tiebreaker read, the median page)."""

    def __init__(self, texts_by_path: dict):
        self.texts = texts_by_path

    def read_batch(self, prepared, prompt, max_new):
        key = getattr(prepared[0], "source_path", None) or self._only()
        return [self.texts[key][0]] * len(prepared)

    def _only(self):
        return next(iter(self.texts))

    def read(self, prepared, prompt, max_new):
        return self.read_batch([prepared], prompt, max_new)[0]

    def release(self) -> None:
        pass


class _MedianStructureLLM:
    """Times every agent call at contract budgets, then pins the median
    routing (critic 1 -> needs_editing, critic 2 -> accept) by editing
    the RESULT JSON after full generation."""

    def __init__(self, inner, caps: dict):
        self.inner = inner
        self.caps = caps
        self.calls: list[dict] = []
        self.critic_count = 0

    def reset_page(self) -> None:
        self.critic_count = 0

    @staticmethod
    def _kind(json_schema) -> str:
        props = (json_schema or {}).get("properties", {})
        if "verdict" in props:
            return "critic"
        if "corrected_text" in props:
            return "editor"
        if "final_text" in props:
            return "arbitrator"
        return "free"

    def chat(self, system_prompt: str, user_message: str, *,
             temperature: float, max_tokens: int,
             json_schema: dict | None = None) -> str:
        kind = self._kind(json_schema)
        cap = self.caps.get(kind) or max_tokens
        start = time.perf_counter()
        out = self.inner.chat(system_prompt, user_message,
                              temperature=temperature, max_tokens=cap,
                              json_schema=json_schema)
        wall = time.perf_counter() - start
        self.calls.append({"kind": kind, "cap": cap,
                           "wall_s": round(wall, 3)})
        if kind == "critic":
            self.critic_count += 1
            accept = self.critic_count % 2 == 0
            try:
                obj = json.loads(out)
            except (json.JSONDecodeError, TypeError):
                obj = {}
            obj["verdict"] = "accept" if accept else "needs_editing"
            obj["overall_confidence"] = 95 if accept else 70
            out = json.dumps(obj)
        return out


def phase_agents(out_path: str, read_path: str, mode: str) -> None:
    """8B engine process: the agent loop over replayed transcripts."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from handwritten_ocr_tpu import config as cfg_mod
    from handwritten_ocr_tpu.config import RunConfig
    from handwritten_ocr_tpu.engine.jax_engines import (JaxReasoningBackend,
                                                        TPUPreprocessor)
    from handwritten_ocr_tpu.graph import OCRPipeline
    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.processor import ByteTokenizer
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from handwritten_ocr_tpu.state import initial_state

    assert jax.default_backend() == "tpu"
    read = json.loads(Path(read_path).read_text())
    pages = read["pages"][:N_CEILING_PAGES if mode == "ceiling" else None]

    # Bound the KV pool: 2 decode slots at the 8k context bound next to
    # ~8.4 GB of int8 weights (24 default slots would blow the ~13 GB
    # usable HBM; agent calls within one page are sequential anyway).
    cfg_mod.SERVE_SLOTS = 2

    cfg = Qwen3Config(vocab_size=151936, hidden_size=4096,
                      intermediate_size=12288, num_hidden_layers=36,
                      num_attention_heads=32, num_key_value_heads=8,
                      head_dim=128, eos_token_id=-1)
    t0 = time.perf_counter()
    params = init_qwen3(jax.random.PRNGKey(7), cfg, dtype=jnp.bfloat16,
                        quantize="int8")
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0
    inner = JaxReasoningBackend(Qwen3Model(params, cfg), ByteTokenizer())
    caps = TYPICAL_CAPS if mode == "typical" else {}
    llm = _MedianStructureLLM(inner, caps)
    texts_by_path = {p["path"]: [_synthetic_page_text(i)]
                     for i, p in enumerate(pages)}
    pipe = OCRPipeline(_ReplayOCR(texts_by_path), llm,
                       preprocessor=TPUPreprocessor(), quiet=True)
    run_cfg = RunConfig()           # contract defaults: llm_max_tokens 4096

    results = []
    for index, page in enumerate(pages):
        llm.reset_page()
        call_base = len(llm.calls)
        state = initial_state(page["path"],
                              config=run_cfg.as_state_dict(),
                              max_iterations=run_cfg.max_iterations)
        start = time.perf_counter()
        final = pipe.run(state)
        wall = time.perf_counter() - start
        page_calls = llm.calls[call_base:]
        results.append({
            "path": page["path"], "agents_wall_s": round(wall, 3),
            "status": final["status"], "iterations": final["iteration"],
            "calls": page_calls,
        })
        print(f"[contract-agents:{mode}] page{index}: {wall:.1f}s "
              f"status={final['status']} calls="
              f"{[(c['kind'], c['wall_s']) for c in page_calls]}",
              flush=True)
    Path(out_path).write_text(json.dumps({
        "init_s": round(init_s, 1), "mode": mode,
        "agent_cap": AGENT_CAP, "caps": caps, "pages": results,
    }))


def main() -> None:
    phase = os.environ.get("HOCR_CONTRACT_PHASE")
    if phase == "read":
        return phase_read(os.environ["HOCR_CONTRACT_OUT"])
    if phase in ("typical", "ceiling"):
        return phase_agents(os.environ["HOCR_CONTRACT_OUT"],
                            os.environ["HOCR_CONTRACT_READ"], phase)

    tmp = REPO / ".contract_tmp"
    tmp.mkdir(exist_ok=True)
    read_out = tmp / "read.json"

    def run(phase: str, out: Path, extra: dict | None = None,
            timeout: float = 2400) -> None:
        env = dict(os.environ, HOCR_CONTRACT_PHASE=phase,
                   HOCR_CONTRACT_OUT=str(out), **(extra or {}))
        print(f"=== contract phase {phase} ===", flush=True)
        subprocess.run([sys.executable, __file__], env=env, check=True,
                       timeout=timeout)

    t_start = time.monotonic()
    if read_out.exists() and os.environ.get("HOCR_CONTRACT_REUSE_READ") == "1":
        print("=== reusing existing read.json ===", flush=True)
    else:
        run("read", read_out)
    typical_out = tmp / "agents_typical.json"
    ceiling_out = tmp / "agents_ceiling.json"
    ref = {"HOCR_CONTRACT_READ": str(read_out)}
    run("typical", typical_out, ref)
    run("ceiling", ceiling_out, ref, timeout=3600)

    read = json.loads(read_out.read_text())
    typical = json.loads(typical_out.read_text())
    ceiling = json.loads(ceiling_out.read_text())
    read_walls = {p["path"]: p["wall_s"] for p in read["pages"]}

    def totals(agents: dict) -> list[float]:
        return sorted(read_walls[p["path"]] + p["agents_wall_s"]
                      for p in agents["pages"])

    typ = totals(typical)
    ceil = totals(ceiling)
    report = {
        "what": ("MEASURED full-contract per-page latency: 7B int8 read, "
                 "2 strategies x 2,048 tokens (ref config.py:19) + 8B-class "
                 "int8 agents through the production graph driver at the "
                 "median structure (2 critic + 1 editor; ref call stack "
                 "3.1/3.3). Two engine processes = the reference's own "
                 "load/unload discipline on one device (ref tools.py:714-725)."),
        "pipeline_contract_p50_s": typ[len(typ) // 2],
        "pipeline_contract_ceiling_s": ceil[len(ceil) // 2],
        "pages_typical": len(typ), "pages_ceiling": len(ceil),
        "per_page_typical_s": typ,
        "per_page_ceiling_s": ceil,
        "read": {"init_s": read["init_s"], "warm_s": read["warm_s"],
                 "per_page_s": sorted(read_walls.values())},
        "agents_typical": typical,
        "agents_ceiling": ceiling,
        "engine_swap_cost_s": typical["init_s"],
        "notes": [
            "typical mode caps critic at 704 / editor at 896 tokens "
            "(EOS emulation; random weights decode to cap)",
            "ceiling mode runs every agent call to the full 4,096 cap",
            "critic verdicts overridden post-generation to pin the "
            "median routing; all engine work is real",
            "p50 excludes engine init (both engines stay resident on a "
            "2-chip serving deployment); engine_swap_cost_s reports it",
        ],
        "total_script_wall_s": round(time.monotonic() - t_start, 1),
    }
    (REPO / "pipeline_contract.json").write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, (dict, list))}, indent=1))

    # Merge into BENCH_DETAIL with provenance.
    import bench
    detail = bench._load_detail()
    detail["pipeline_contract"] = {
        **{k: report[k] for k in (
            "what", "pipeline_contract_p50_s", "pipeline_contract_ceiling_s",
            "pages_typical", "pages_ceiling", "engine_swap_cost_s")},
        "_source": "live (scripts/pipeline_contract.py)",
        "_backend": "tpu",
        "_measured_at": time.strftime("%Y-%m-%d"),
    }
    bench._save_detail(detail)
    print("[contract] merged into BENCH_DETAIL.json", flush=True)


if __name__ == "__main__":
    main()
