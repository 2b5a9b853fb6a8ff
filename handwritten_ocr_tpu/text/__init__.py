"""Pure text tools: the scoring oracle and merge/diff machinery.

These functions must be *numerically identical* to the reference
(``/root/reference/ocr_agent/tools.py``) — they define CER/WER scoring and the
deterministic merge used by the pipeline. The implementations here are
independent (vectorized NumPy DP engines with an optional C++ fast path)
but contract-tested to produce the same outputs.
"""

from handwritten_ocr_tpu.text.gt import parse_ground_truth
from handwritten_ocr_tpu.text.normalize import normalize_text
from handwritten_ocr_tpu.text.metrics import (
    cer,
    levenshtein,
    tier1_metrics,
    wer,
    word_levenshtein,
)
from handwritten_ocr_tpu.text.diff import compare_versions
from handwritten_ocr_tpu.text.merge import merge_versions

__all__ = [
    "parse_ground_truth",
    "normalize_text",
    "levenshtein",
    "word_levenshtein",
    "cer",
    "wer",
    "tier1_metrics",
    "compare_versions",
    "merge_versions",
]
