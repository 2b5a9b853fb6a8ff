"""Tests for JSON extraction, evaluation wrapper, trace store, state factory."""

import json
import time

from handwritten_ocr_tpu.evaluation import evaluate
from handwritten_ocr_tpu.state import initial_state, trace_log
from handwritten_ocr_tpu.trace import Trace
from handwritten_ocr_tpu.utils.jsonio import extract_json


# ── extract_json ────────────────────────────────────────────────────

def test_extract_direct():
    assert extract_json('{"a": 1}') == {"a": 1}


def test_extract_fenced():
    assert extract_json('```json\n{"a": [1, 2]}\n```') == {"a": [1, 2]}
    assert extract_json("```\n[1, 2]\n```") == [1, 2]


def test_extract_with_preamble_and_tail():
    assert extract_json('Sure! Here it is: {"x": {"y": 2}} hope that helps') == {"x": {"y": 2}}


def test_extract_object_preferred_over_array():
    assert extract_json('text [1,2] and {"k": 3}') == {"k": 3}


def test_extract_array_fallback():
    assert extract_json("bad { not json } but [1, 2] ok") == [1, 2]


def test_extract_failure_returns_none():
    assert extract_json("nothing json here") is None
    assert extract_json("pre {broken") is None


def test_extract_nested_braces_in_strings():
    raw = '{"s": "braces } inside", "n": 1}'
    # Balanced-scan can mis-split on braces inside strings, but the direct
    # parse path handles this case first.
    assert extract_json(raw) == {"s": "braces } inside", "n": 1}


# ── evaluate ────────────────────────────────────────────────────────

def test_evaluate_without_gt():
    assert evaluate("some text") == {}


def test_evaluate_with_gt():
    out = evaluate("abc", ground_truth="abc", quiet=True)
    assert out["tier1_raw_vs_gt"]["cer"] == 0.0
    assert out["tier1_raw_vs_gt"]["exact_match"] is True


# ── Trace ───────────────────────────────────────────────────────────

def _sample_trace() -> Trace:
    t = Trace()
    t.log(0, "reader", "ocr", "img", "OCR pass (x) → 5 chars", metrics={"chars": 5})
    t.log(1, "critic", "critique", "text", "Critic: confidence 90", decision="accept")
    return t


def test_trace_event_schema():
    t = _sample_trace()
    e = t.events[0]
    assert set(e) == {
        "timestamp", "elapsed_seconds", "iteration", "agent", "action",
        "input_summary", "output_summary", "full_input", "full_output",
        "metrics", "decision",
    }
    assert e["metrics"] == {"chars": 5}
    assert e["decision"] is None
    assert t.events[1]["decision"] == "accept"


def test_trace_save_json_and_summary(tmp_path):
    t = _sample_trace()
    jpath = tmp_path / "sub" / "t_trace.json"
    spath = tmp_path / "sub" / "t_trace_summary.txt"
    t.save_json(jpath)
    t.save_summary(spath)
    events = json.loads(jpath.read_text())
    assert len(events) == 2
    lines = spath.read_text().splitlines()
    assert lines[0].startswith("[00:0") and "OCR pass" in lines[0]


def test_trace_from_events_roundtrip():
    t = _sample_trace()
    t2 = Trace.from_events(t.events)
    assert t2.events == t.events


# ── state ───────────────────────────────────────────────────────────

def test_initial_state_defaults():
    cfg = {"accept_threshold": 85, "plateau_patience": 2,
           "strategies": [["a"]], "agreement_threshold": 80}
    s = initial_state("/img.png", config=cfg, max_iterations=10)
    assert s["status"] == "running"
    assert s["iteration"] == 0 and s["plateau_count"] == 0
    assert s["current_best"] == "" and s["prev_critique"] is None
    assert s["config"]["accept_threshold"] == 85


def test_trace_log_event_format(capsys):
    cfg = {"accept_threshold": 85, "plateau_patience": 2,
           "strategies": [], "agreement_threshold": 80}
    s = initial_state("/img.png", config=cfg, max_iterations=10,
                      start_time=time.monotonic() - 65)
    e = trace_log(s, iteration=2, agent="editor", action="edit",
                  input_summary="in", output_summary="Editor: fixed 3 issues")
    assert e["iteration"] == 2 and e["agent"] == "editor"
    assert e["elapsed_seconds"] >= 65
    out = capsys.readouterr().out
    assert out.startswith("[01:0") and "Editor: fixed 3 issues" in out
