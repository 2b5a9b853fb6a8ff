"""Pydantic output contracts for the three reasoning agents.

Field names, types, bounds, and defaults are a behavioral contract shared
with the reference (agents.py:18-67): every model ignores extra keys and
defaults every optional field, so partially-valid LLM JSON still validates.
"""

from __future__ import annotations

from typing import Literal

from pydantic import BaseModel, ConfigDict, Field


class _LenientModel(BaseModel):
    """Base: tolerate extra keys from the LLM (contract: extra='ignore')."""

    model_config = ConfigDict(extra="ignore")


class CriticIssue(_LenientModel):
    description: str = ""
    severity: Literal["critical", "minor", "cosmetic"] = "minor"
    suggestion: str = ""


class CriticSegment(_LenientModel):
    text: str = ""
    confidence: int = Field(default=50, ge=0, le=100)
    issues: list[CriticIssue] = []


class CriticResult(_LenientModel):
    overall_confidence: int = Field(default=0, ge=0, le=100)
    segments: list[CriticSegment] = []
    verdict: Literal["accept", "needs_editing", "needs_reocr"] = "needs_editing"
    reasoning: str = ""


class EditorChange(_LenientModel):
    original: str = ""
    corrected: str = ""
    reason: str = ""
    confidence: int = Field(default=50, ge=0, le=100)


class EditorResult(_LenientModel):
    corrected_text: str
    changes: list[EditorChange] = []
    unresolved: list[str] = []


class ArbitratorDecision(_LenientModel):
    segment: str = ""
    chosen_version: int = Field(default=1, ge=1)
    reason: str = ""


class ArbitratorResult(_LenientModel):
    final_text: str
    decisions: list[ArbitratorDecision] = []
    confidence: int = Field(default=0, ge=0, le=100)
    uncertain_segments: list[str] = []
