"""Model engines and pluggable backends.

Two engine roles (reference layer L0, SURVEY.md §1):
  * OCR backend  — vision-language model read of a page image.
  * Reasoning backend — structured-JSON chat LLM for critic/editor/arbitrator.

Implementations:
  * JAX on-device engines (models/ + this package) — the TPU-native path.
  * :class:`OllamaBackend` — HTTP client matching the reference's wire
    behavior, for A/B parity testing against a live Ollama daemon.
  * Scripted fakes (:mod:`handwritten_ocr_tpu.engine.fakes`) — deterministic
    backends for unit-testing graph routing without any model.
"""

from handwritten_ocr_tpu.engine.llm_client import ReasoningBackend, call_llm_json
from handwritten_ocr_tpu.engine.fakes import ScriptedReasoningBackend, ScriptedOCRBackend
from handwritten_ocr_tpu.engine.protocols import OCRBackend

__all__ = [
    "ReasoningBackend",
    "OCRBackend",
    "call_llm_json",
    "ScriptedReasoningBackend",
    "ScriptedOCRBackend",
]
