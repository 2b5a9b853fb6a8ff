"""Agent-layer tests: schemas, prompt rendering, retry ladder, fallbacks."""

import pytest
from pydantic import ValidationError

from handwritten_ocr_tpu.agents import (
    ArbitratorResult,
    CriticResult,
    EditorResult,
    run_arbitrator,
    run_critic,
    run_editor,
    schema_example,
)
from handwritten_ocr_tpu.agents.runners import format_critic_issues, format_versions
from handwritten_ocr_tpu.engine.fakes import ScriptedReasoningBackend
from handwritten_ocr_tpu.engine.llm_client import call_llm_json


# ── schemas ─────────────────────────────────────────────────────────

def test_schemas_ignore_extra_and_default():
    r = CriticResult.model_validate({"overall_confidence": 70, "bogus_key": 1})
    assert r.overall_confidence == 70
    assert r.verdict == "needs_editing"
    assert r.segments == [] and r.reasoning == ""


def test_schema_bounds_enforced():
    with pytest.raises(ValidationError):
        CriticResult.model_validate({"overall_confidence": 101})
    with pytest.raises(ValidationError):
        CriticResult.model_validate({"verdict": "not_a_verdict"})


def test_editor_requires_corrected_text():
    with pytest.raises(ValidationError):
        EditorResult.model_validate({"changes": []})


def test_schema_example_critic_rendering():
    text = schema_example(CriticResult)
    assert '"overall_confidence": <0-100>' in text
    assert '"verdict": "accept" | "needs_editing" | "needs_reocr"' in text
    assert '"severity": "critical" | "minor" | "cosmetic"' in text
    assert '"reasoning": <string>' in text
    # Nested list-of-model renders as a bracketed block.
    assert '"segments": [' in text
    # Valid-shaped: no quoted markers leak through.
    assert '"<string>"' not in text and '"<0-100>"' not in text


def test_schema_example_arbitrator_rendering():
    text = schema_example(ArbitratorResult)
    assert '"final_text": <string>' in text
    # chosen_version has ge=1 but no le → generic integer placeholder.
    assert '"chosen_version": <integer>' in text
    assert '"uncertain_segments": [' in text


# ── retry ladder ────────────────────────────────────────────────────

def test_ladder_tier1_structured_success():
    be = ScriptedReasoningBackend([{"a": 1}])
    out = call_llm_json(be, "sys", "user", json_schema={"type": "object"}, quiet=True)
    assert out == {"a": 1}
    assert len(be.calls) == 1
    assert be.calls[0]["json_schema"] == {"type": "object"}


def test_ladder_tier2_freetext_fallback():
    be = ScriptedReasoningBackend(["not json at all", 'prefix {"b": 2} suffix'])
    out = call_llm_json(be, "sys", "user", json_schema={"type": "object"}, quiet=True)
    assert out == {"b": 2}
    assert len(be.calls) == 2
    assert be.calls[1]["json_schema"] is None


def test_ladder_tier3_retry_with_json_suffix():
    # Without a json_schema, tier 1 is skipped: free-text call then retry.
    be = ScriptedReasoningBackend(["garbage", '{"c": 3}'])
    out = call_llm_json(be, "sys", "user", quiet=True)
    assert out == {"c": 3}
    assert len(be.calls) == 2
    assert "ONLY valid JSON" in be.calls[1]["user"]


def test_ladder_exhausted_error_dict():
    be = ScriptedReasoningBackend(["x", "y"])
    out = call_llm_json(be, "sys", "user", quiet=True)
    assert out == {"error": "json_parse_failed", "raw_response": "y"}


# ── runners ─────────────────────────────────────────────────────────

def test_run_critic_prompt_contains_transcription_and_schema():
    be = ScriptedReasoningBackend([{
        "overall_confidence": 88, "verdict": "accept", "segments": [], "reasoning": "ok"
    }])
    result = run_critic(be, "THE TEXT", quiet=True)
    assert result.overall_confidence == 88
    user = be.calls[0]["user"]
    assert "THE TEXT" in user
    assert "## Transcription" in user
    assert '"overall_confidence": <0-100>' in user
    assert "Previous Critique" not in user


def test_run_critic_includes_previous_critique():
    prev = CriticResult(overall_confidence=40, verdict="needs_editing", reasoning="was bad")
    be = ScriptedReasoningBackend([{"overall_confidence": 60}])
    run_critic(be, "text", previous_critique=prev, quiet=True)
    user = be.calls[0]["user"]
    assert "Previous confidence: 40" in user
    assert "Previous verdict: needs_editing" in user
    assert "Previous reasoning: was bad" in user


def test_format_critic_issues():
    critique = CriticResult.model_validate({
        "segments": [
            {"text": "teh", "issues": [
                {"description": "typo", "severity": "minor", "suggestion": "the"}]},
            {"text": "ok", "issues": []},
            {"text": "xx", "issues": [
                {"description": "noise", "severity": "critical", "suggestion": ""}]},
        ],
    })
    lines = format_critic_issues(critique)
    assert lines == [
        '- [minor] "teh" → typo (suggestion: the)',
        '- [critical] "xx" → noise (suggestion: none)',
    ]
    assert format_critic_issues(CriticResult()) == ["No specific issues listed."]


def test_run_editor_fallback_keeps_input():
    be = ScriptedReasoningBackend([{"not_the_schema": 1}])
    out = run_editor(be, "original text", CriticResult(), quiet=True)
    assert out.corrected_text == "original text"
    assert out.changes == []


def test_format_versions():
    text = format_versions([
        {"text": "v1 text", "source": "current_best", "score": 72},
        {"text": "v2 text", "source": "ocr_deskew"},
    ])
    assert "## Version 1 — current_best (critic score: 72)" in text
    assert "## Version 2 — ocr_deskew\n" in text
    assert "(critic score" not in text.split("## Version 2")[1]


def test_run_arbitrator_fallback_first_version():
    be = ScriptedReasoningBackend([{"decisions": "bad-shape"}])
    out = run_arbitrator(be, [{"text": "first", "source": "a"},
                              {"text": "second", "source": "b"}], quiet=True)
    assert out.final_text == "first"
