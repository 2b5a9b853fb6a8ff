"""LLM agents: critic, editor, arbitrator.

Each agent is one structured LLM call against a pluggable reasoning backend
(on-device JAX Qwen3 decode, an Ollama HTTP client for parity testing, or a
scripted fake for unit tests). Output contracts are the validated pydantic
schemas in :mod:`handwritten_ocr_tpu.agents.schemas`.
"""

from handwritten_ocr_tpu.agents.schemas import (
    ArbitratorDecision,
    ArbitratorResult,
    CriticIssue,
    CriticResult,
    CriticSegment,
    EditorChange,
    EditorResult,
)
from handwritten_ocr_tpu.agents.schema_prompt import schema_example
from handwritten_ocr_tpu.agents.runners import run_arbitrator, run_critic, run_editor

__all__ = [
    "CriticIssue",
    "CriticSegment",
    "CriticResult",
    "EditorChange",
    "EditorResult",
    "ArbitratorDecision",
    "ArbitratorResult",
    "schema_example",
    "run_critic",
    "run_editor",
    "run_arbitrator",
]
