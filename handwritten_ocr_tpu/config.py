"""Configuration for the TPU-native agentic OCR pipeline.

Keeps the same tunable names, defaults, and semantics as the reference
(``/root/reference/ocr_agent/config.py:1-36``), expressed as a frozen
dataclass so runs can carry immutable config snapshots, plus TPU-specific
knobs that have no reference counterpart (mesh shape, dtype, decode block).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

# ── Reasoning-LLM configuration (reference config.py:7-13) ──────────
OLLAMA_MODEL = "qwen3:32b"
LLM_TEMPERATURE = 0.1
LLM_MAX_TOKENS = 4096
LLM_TIMEOUT = 300  # seconds
LLM_STREAM = True
LLM_ENABLE_THINKING = False

# ── OCR model configuration (reference config.py:15-20) ─────────────
OLMOCR_MODEL = "allenai/olmOCR-2-7B-1025"
OCR_MAX_PIXELS = 1024 * 1024
OCR_MIN_PIXELS = 256 * 256
OCR_MAX_NEW_TOKENS = 2048
OCR_PROMPT = "Extract and return all the text from this handwritten document."

# ── Orchestrator configuration (reference config.py:22-36) ──────────
MAX_ITERATIONS = 10
ACCEPT_THRESHOLD = 85  # critic confidence to auto-accept
PLATEAU_PATIENCE = 2  # stop if no improvement for N iterations
AGREEMENT_THRESHOLD = 80  # % agreement below which a tiebreaker OCR pass runs

# Ordered strategy bank. Each entry is a transform chain applied left-to-right.
# First two entries are the initial reads; the rest are tried on re-OCR.
# Entry 0 and 5 are intentionally identical (matching the reference bank,
# config.py:29-36) — the label dedup in the driver makes #5 a no-op on re-OCR.
PREPROCESSING_STRATEGIES: list[list[str]] = [
    ["deskew", "high_contrast", "binarize"],
    ["high_contrast", "binarize"],
    ["deskew", "high_contrast", "sharpen"],   # best general pipeline for phone photos
    ["deskew", "denoise", "high_contrast"],   # noisy / low-light photos
    ["deskew", "remove_lines", "high_contrast"],  # lined notebook paper
    ["deskew", "high_contrast", "binarize"],  # very faint ink
]

# ── TPU-specific knobs (no reference counterpart) ────────────────────
# Device mesh axis names used throughout parallel/:
#   "data"  — pages (data parallel / FSDP)
#   "model" — tensor parallel (attention heads / MLP columns)
MESH_AXES = ("data", "model")
COMPUTE_DTYPE = "bfloat16"
# Decode loop runs in fixed-size blocks so XLA compiles one program per block
# count instead of per token count.
DECODE_BLOCK = 128
# Pages per device in batch mode (folder workloads).
PAGES_PER_DEVICE = 1

# ── Continuous-batching serving (engine/serving.py) ──────────────────
# Fixed decode-slot count (static batch width of the serving program).
# The decode step is HBM-weight-bound, so tokens/s scales almost
# linearly with slots until KV pool memory or step latency push back
# (measured on v5e, 7B int8 weights: 8 slots = 688 tok/s @ 11.6 ms,
# 16 = 1272 @ 12.6, 24 = 1719 @ 14.0 at short contexts; 24 slots x
# 2.6k-token contexts = 1157 tok/s with the int8 KV cache). 24 slots +
# int8 KV keep the 7B VLM + pool within one 16 GB chip at the
# 2,048-token contract budget.
SERVE_SLOTS = 24
# KV block granularity in tokens; pool block 0 is the reserved trash sink.
SERVE_BLOCK_SIZE = 128
# Decode steps per dispatch. Every dispatch pays a fixed host round-trip
# (tens of ms through the dev tunnel), so larger chunks amortize it —
# measured on the 24-slot 7B bench: chunk 16 = 67.9% of the HBM floor,
# 32 = 71.6%, 64 = 76.9%, 128 = 83.5%. The batcher picks per dispatch:
# SERVE_CHUNK when any live request streams tokens (latency cadence),
# SERVE_THROUGHPUT_CHUNK otherwise (batch reads, agent batches).
SERVE_CHUNK = 32
SERVE_THROUGHPUT_CHUNK = 128
# Prompt lengths pad up to a multiple of this (bounds compiled prefills).
SERVE_PREFILL_BUCKET = 128
# int8 KV cache on the TPU serving path: per-token/per-head scales
# (amax/127 over head_dim), quantize on append / dequantize on page read
# inside the fused decode kernel. Halves pool HBM and page-DMA bytes;
# CPU test runs keep full-precision KV for bit-comparability.
SERVE_KV_INT8 = True

# Pages per vision-tower dispatch: batches wider than this encode in
# sequential chunks (lax.map) inside one jitted program. The tower is
# compute-bound, so chunking costs ~nothing while capping the program's
# temp arena (a batch-24 flagship encode peaked ~2.3 GB next to the
# int8 7B params + KV pools — past the chip's usable HBM).
SERVE_VISION_CHUNK = int(os.environ.get("HOCR_VISION_CHUNK", "8"))


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Immutable per-run snapshot of the orchestrator configuration.

    Mirrors the ``state["config"]`` dict the reference snapshots at
    transcribe.py:59-64 (accept_threshold, plateau_patience, strategies,
    agreement_threshold) and adds the remaining tunables.
    """

    accept_threshold: int = ACCEPT_THRESHOLD
    plateau_patience: int = PLATEAU_PATIENCE
    agreement_threshold: int = AGREEMENT_THRESHOLD
    max_iterations: int = MAX_ITERATIONS
    strategies: Sequence[Sequence[str] | str] = dataclasses.field(
        default_factory=lambda: [list(s) for s in PREPROCESSING_STRATEGIES]
    )
    ocr_prompt: str = OCR_PROMPT
    ocr_max_new_tokens: int = OCR_MAX_NEW_TOKENS
    ocr_min_pixels: int = OCR_MIN_PIXELS
    ocr_max_pixels: int = OCR_MAX_PIXELS
    llm_temperature: float = LLM_TEMPERATURE
    llm_max_tokens: int = LLM_MAX_TOKENS

    def as_state_dict(self) -> dict:
        """The subset the reference stores in ``state['config']``."""
        return {
            "accept_threshold": self.accept_threshold,
            "plateau_patience": self.plateau_patience,
            "strategies": [list(s) if not isinstance(s, str) else s for s in self.strategies],
            "agreement_threshold": self.agreement_threshold,
        }
