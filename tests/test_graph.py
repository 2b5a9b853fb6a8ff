"""Graph routing + driver tests against scripted (model-free) backends.

Covers the reference's exact routing precedence (graph.py:22-43), plateau
semantics (equal score counts as no improvement, nodes.py:190-194), strategy
exhaustion (nodes.py:247-258), and terminal node statuses.
"""

import pytest

from handwritten_ocr_tpu.config import RunConfig
from handwritten_ocr_tpu.engine.fakes import ScriptedOCRBackend, ScriptedReasoningBackend
from handwritten_ocr_tpu.graph import OCRPipeline, route_after_critic, route_after_reocr
from handwritten_ocr_tpu.graph.driver import strategy_label
from handwritten_ocr_tpu.state import initial_state


def make_state(**overrides):
    cfg = RunConfig(strategies=[["a"], ["b"], ["c"]])
    s = initial_state("/img.png", config={**cfg.as_state_dict(), "ocr_prompt": "read",
                                          "ocr_max_new_tokens": 64},
                      max_iterations=overrides.pop("max_iterations", 10))
    s.update(overrides)
    return s


def critic_json(confidence, verdict="needs_editing", issues=()):
    return {
        "overall_confidence": confidence,
        "segments": [{"text": t, "confidence": 50,
                      "issues": [{"description": d, "severity": sev, "suggestion": ""}]}
                     for (t, d, sev) in issues],
        "verdict": verdict,
        "reasoning": "scripted",
    }


def editor_json(text, n_changes=1):
    return {
        "corrected_text": text,
        "changes": [{"original": "x", "corrected": "y", "reason": "r", "confidence": 90}
                    for _ in range(n_changes)],
        "unresolved": [],
    }


def arbitrator_json(text, confidence=75):
    return {"final_text": text, "decisions": [], "confidence": confidence,
            "uncertain_segments": []}


# ── routing precedence ──────────────────────────────────────────────

def routed(confidence, verdict, *, plateau=0, iteration=1, max_iter=10):
    s = make_state(plateau_count=plateau, iteration=iteration, max_iterations=max_iter)
    s["critiques"] = [critic_json(confidence, verdict)]
    return route_after_critic(s)


def test_route_accept_by_verdict():
    assert routed(10, "accept") == "accept"


def test_route_accept_by_threshold():
    assert routed(85, "needs_editing") == "accept"
    assert routed(84, "needs_editing") == "edit"


def test_route_accept_beats_plateau_and_max_iter():
    assert routed(90, "needs_reocr", plateau=5, iteration=99) == "accept"


def test_route_plateau_beats_max_iter_and_reocr():
    assert routed(10, "needs_reocr", plateau=2, iteration=99) == "plateau"


def test_route_max_iter_beats_reocr():
    assert routed(10, "needs_reocr", plateau=0, iteration=10) == "max_iterations"


def test_route_reocr_then_edit():
    assert routed(10, "needs_reocr") == "reocr"
    assert routed(10, "needs_editing") == "edit"


def test_route_after_reocr():
    s = make_state()
    s["reason"] = "exhausted"
    assert route_after_reocr(s) == "max_iterations"
    s["reason"] = ""
    assert route_after_reocr(s) == "critic"


# ── full pipeline runs ──────────────────────────────────────────────

def test_accept_first_iteration():
    ocr = ScriptedOCRBackend(by_key={"a": "hello world", "b": "hello world"})
    llm = ScriptedReasoningBackend([critic_json(95, "accept")])
    pipe = OCRPipeline(ocr, llm, quiet=True)
    final = pipe.run(make_state())

    assert final["status"] == "completed"
    assert final["reason"] == "accept"
    assert final["iteration"] == 1
    assert final["current_best"] == "hello world"
    assert final["strategies_used"] == ["a", "b"]
    # High agreement (identical reads) → no tiebreaker third read.
    assert len(final["candidates"]) == 2
    assert ocr.release_count == 1
    # Per-pass interleaving matches the reference (nodes.py:42-70):
    # preprocess, ocr, preprocess, ocr — even though the two reads share
    # one batched forward.
    actions = [e["action"] for e in final["trace_events"]]
    assert actions == ["preprocess", "ocr", "preprocess", "ocr",
                       "compare", "merge", "critique", "accept"]


def test_low_agreement_triggers_tiebreaker_read():
    ocr = ScriptedOCRBackend(by_key={
        "a": "aaaa bbbb cccc dddd",
        "b": "zzzz yyyy xxxx wwww",  # total disagreement
        "c": "aaaa bbbb cccc dddd",
    })
    llm = ScriptedReasoningBackend([critic_json(95, "accept")])
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state())
    assert final["strategies_used"] == ["a", "b", "c"]
    assert len(final["candidates"]) == 3
    # Majority vote: two identical candidates win every position.
    assert final["current_best"] == "aaaa bbbb cccc dddd"
    cmp_event = next(e for e in final["trace_events"] if e["action"] == "compare")
    assert cmp_event["decision"] == "tiebreaker"


def test_edit_loop_then_accept():
    ocr = ScriptedOCRBackend(by_key={"a": "teh text", "b": "teh text"})
    llm = ScriptedReasoningBackend([
        critic_json(50, "needs_editing", issues=[("teh", "typo", "minor")]),
        editor_json("the text"),
        critic_json(95, "accept"),
    ])
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state())
    assert final["status"] == "completed" and final["reason"] == "accept"
    assert final["iteration"] == 2
    assert final["current_best"] == "the text"
    assert len(final["edits"]) == 1
    # prev_critique must be stashed by the editor for the next critic turn.
    assert final["prev_critique"]["overall_confidence"] == 50
    # Second critic call receives the previous critique section.
    assert "Previous confidence: 50" in llm.calls[2]["user"]


def test_plateau_stops_after_patience():
    ocr = ScriptedOCRBackend(by_key={"a": "x", "b": "x"})
    llm = ScriptedReasoningBackend([
        critic_json(50), editor_json("x1"),
        critic_json(50), editor_json("x2"),   # equal → plateau_count 1
        critic_json(49),                      # lower → plateau_count 2 → stop
    ])
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state())
    assert final["status"] == "completed" and final["reason"] == "plateau"
    assert final["iteration"] == 3
    assert final["plateau_count"] == 2
    assert final["current_best"] == "x2"


def test_improvement_resets_plateau():
    ocr = ScriptedOCRBackend(by_key={"a": "x", "b": "x"})
    llm = ScriptedReasoningBackend([
        critic_json(50), editor_json("x1"),
        critic_json(50), editor_json("x2"),   # plateau 1
        critic_json(60), editor_json("x3"),   # improvement → reset to 0
        critic_json(95, "accept"),
    ])
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state())
    assert final["reason"] == "accept"
    assert final["iteration"] == 4


def test_max_iterations_terminal():
    ocr = ScriptedOCRBackend(by_key={"a": "x", "b": "x"})
    responses = []
    for i in range(3):
        responses += [critic_json(30 + i * 10), editor_json(f"x{i}")]
    responses += [critic_json(70)]  # iteration 4 still improving, but cap=4...
    llm = ScriptedReasoningBackend(responses)
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state(max_iterations=4))
    assert final["status"] == "max_iterations"
    assert final["reason"] == "max_iterations"
    assert final["iteration"] == 4


def test_reocr_branch_and_arbitration():
    ocr = ScriptedOCRBackend(by_key={"a": "v1", "b": "v1", "c": "v3"})
    llm = ScriptedReasoningBackend([
        critic_json(40, "needs_reocr"),
        arbitrator_json("arbitrated text", confidence=80),
        critic_json(95, "accept"),
    ])
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state())
    assert final["reason"] == "accept"
    assert final["current_best"] == "arbitrated text"
    assert final["strategies_used"] == ["a", "b", "c"]
    # Arbitrator prompt contains both versions with sources.
    arb_call = llm.calls[1]["user"]
    assert "current_best" in arb_call and "ocr_c" in arb_call
    assert "critic score: 40" in arb_call
    assert ocr.release_count == 2  # initial + reocr


def test_reocr_exhaustion_terminal():
    # Only two strategies; both consumed in phase 1 → re-OCR finds nothing.
    cfg = RunConfig(strategies=[["a"], ["b"]])
    s = initial_state("/img.png", config=cfg.as_state_dict(), max_iterations=10)
    ocr = ScriptedOCRBackend(by_key={"a": "v1", "b": "v1"})
    llm = ScriptedReasoningBackend([critic_json(40, "needs_reocr")])
    final = OCRPipeline(ocr, llm, quiet=True).run(s)
    assert final["status"] == "completed"
    assert final["reason"] == "exhausted"
    ev = final["trace_events"][-1]
    assert ev["action"] == "strategies_exhausted"
    assert ev["decision"] == "exhausted_stop"


def test_duplicate_strategy_skipped_on_reocr():
    # Bank with a duplicate chain (reference config.py:29-36 has one): the
    # label dedup makes the duplicate a silent no-op, so re-OCR exhausts.
    cfg = RunConfig(strategies=[["a"], ["b"], ["a"]])
    s = initial_state("/img.png", config=cfg.as_state_dict(), max_iterations=10)
    ocr = ScriptedOCRBackend(by_key={"a": "v1", "b": "v1"})
    llm = ScriptedReasoningBackend([critic_json(40, "needs_reocr")])
    final = OCRPipeline(ocr, llm, quiet=True).run(s)
    assert final["reason"] == "exhausted"
    assert final["strategies_used"] == ["a", "b"]


def test_critic_validation_fallback_drives_edit():
    ocr = ScriptedOCRBackend(by_key={"a": "x", "b": "x"})
    llm = ScriptedReasoningBackend([
        # Parseable JSON but schema-invalid (confidence out of range): the
        # retry ladder does NOT re-call (it only retries parse failures,
        # matching reference tools.py:246-299); run_critic falls back.
        {"overall_confidence": 5000, "verdict": "accept"},
        editor_json("fixed"),
        critic_json(95, "accept"),
    ])
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state())
    # Fallback critique: confidence 0, needs_editing → editor runs.
    assert final["critiques"][0]["overall_confidence"] == 0
    assert final["critiques"][0]["reasoning"] == "LLM output failed schema validation"
    assert final["current_best"] == "fixed"
    assert final["reason"] == "accept"


def test_editor_validation_fallback_keeps_text():
    ocr = ScriptedOCRBackend(by_key={"a": "orig", "b": "orig"})
    llm = ScriptedReasoningBackend([
        critic_json(50, "needs_editing"),
        {"nonsense": True},  # parseable but schema-invalid → editor fallback
        critic_json(50),     # equal → plateau 1
        {"nonsense": True},
        critic_json(50),     # plateau 2 → stop
    ])
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state())
    assert final["current_best"] == "orig"
    assert final["reason"] == "plateau"


def test_batched_initial_reads_single_backend_call():
    """TPU contract: initial strategy reads happen as ONE read_batch call."""
    calls = []

    class BatchSpy:
        def read_batch(self, images, prompt, max_new_tokens):
            calls.append(len(images))
            return ["same text"] * len(images)
        def read(self, image, prompt, max_new_tokens):
            return self.read_batch([image], prompt, max_new_tokens)[0]
        def release(self):
            pass

    llm = ScriptedReasoningBackend([critic_json(95, "accept")])
    final = OCRPipeline(BatchSpy(), llm, quiet=True).run(make_state())
    assert calls == [2]  # both initial strategies in one batched forward
    assert final["reason"] == "accept"


def test_strategy_label():
    assert strategy_label("deskew") == "deskew"
    assert strategy_label(["deskew", "binarize"]) == "deskew+binarize"


def test_snapshot_and_resume(tmp_path):
    """A crash mid-run resumes from the last completed node (new capability)."""
    snap = str(tmp_path / "state.json")
    ocr = ScriptedOCRBackend(by_key={"a": "draft", "b": "draft"})

    class ExplodingBackend(ScriptedReasoningBackend):
        def chat(self, *a, **k):
            if len(self.calls) == 2:  # third call (second critic) explodes
                raise RuntimeError("simulated crash")
            return super().chat(*a, **k)

    llm = ExplodingBackend([
        critic_json(50, "needs_editing"), editor_json("edited"),
        critic_json(95, "accept"),
    ])
    pipe = OCRPipeline(ocr, llm, quiet=True)
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipe.run(make_state(), snapshot_path=snap)

    # Snapshot recorded the editor's completed work.
    import json as json_mod
    saved = json_mod.loads(open(snap).read())
    assert saved["next_node"] == "critic"
    assert saved["state"]["current_best"] == "edited"

    # Resume: only the remaining critic call runs; no OCR redo.
    ocr2 = ScriptedOCRBackend()  # would raise if any read happened
    llm2 = ScriptedReasoningBackend([critic_json(95, "accept")])
    final = OCRPipeline(ocr2, llm2, quiet=True).run(
        make_state(), snapshot_path=snap, resume=True)
    assert final["status"] == "completed"
    assert final["reason"] == "accept"
    assert final["current_best"] == "edited"
    assert not (tmp_path / "state.json").exists()  # cleaned up when done


def test_snapshot_removed_on_success(tmp_path):
    snap = str(tmp_path / "s.json")
    ocr = ScriptedOCRBackend(by_key={"a": "x", "b": "x"})
    llm = ScriptedReasoningBackend([critic_json(95, "accept")])
    final = OCRPipeline(ocr, llm, quiet=True).run(make_state(),
                                                  snapshot_path=snap)
    assert final["reason"] == "accept"
    import os
    assert not os.path.exists(snap)


def test_empty_strategy_bank_uses_original():
    """No strategies configured → single 'original' read (nodes.py:86-87)."""
    cfg = RunConfig(strategies=[])
    s = initial_state("/img.png", config=cfg.as_state_dict(), max_iterations=5)
    ocr = ScriptedOCRBackend(by_key={"original": "raw read"})
    llm = ScriptedReasoningBackend([critic_json(95, "accept")])
    final = OCRPipeline(ocr, llm, quiet=True).run(s)
    assert final["strategies_used"] == ["original"]
    assert final["current_best"] == "raw read"
    assert final["reason"] == "accept"
