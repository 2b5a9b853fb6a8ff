"""SchemaSession state machine: scripted-logit drives must always yield
schema-valid objects (the constrained-decoding contract)."""

import json

import pytest

from handwritten_ocr_tpu.agents.schemas import (
    ArbitratorResult,
    CriticResult,
    EditorResult,
)
from handwritten_ocr_tpu.models.processor import ByteTokenizer
from handwritten_ocr_tpu.utils.schema_decode import (
    SchemaSession,
    compile_schema,
    find_unescaped_quote,
)

EOS = 151645
TOK = ByteTokenizer()


def session_for(model_cls, max_tokens=4096):
    spec = compile_schema(model_cls.model_json_schema())
    return SchemaSession(spec, TOK, EOS, max_tokens)


def drive(session, script):
    """Feed ``script`` (chars/ids) as the top-1 prediction whenever the
    session is about to consult logits; junk ids 1-3 pad the top-k."""
    ids = [ord(c) if isinstance(c, str) else c for c in script]
    committed = []
    i = 0
    steps = 0
    while not session.done and steps < 50_000:
        steps += 1
        consults = not session._forced and session._action is not None
        top = ([ids[i] if i < len(ids) else EOS] if consults else [0])
        top += [1, 2, 3]
        token = session.next_token(top)
        if consults:
            i += 1
        if token is None:
            break
        committed.append(token)
    return committed


# ── helpers ──────────────────────────────────────────────────────────

def test_find_unescaped_quote():
    assert find_unescaped_quote('abc"def') == 3
    assert find_unescaped_quote('a\\"bc"d') == 5
    assert find_unescaped_quote("no quote") == -1
    assert find_unescaped_quote('\\\\"x') == 2      # escaped backslash


def test_compile_schema_critic():
    spec = compile_schema(CriticResult.model_json_schema())
    kinds = {f.name: f.kind for f in spec.fields}
    assert kinds == {"overall_confidence": "integer", "segments": "array",
                     "verdict": "enum", "reasoning": "string"}
    conf = next(f for f in spec.fields if f.name == "overall_confidence")
    assert (conf.lo, conf.hi) == (0, 100)
    seg = next(f for f in spec.fields if f.name == "segments")
    assert seg.item_kind == "object"
    assert {f.name for f in seg.item_spec.fields} == \
        {"text", "confidence", "issues"}


# ── full drives ──────────────────────────────────────────────────────

def test_critic_simple_drive():
    session = session_for(CriticResult)
    # int 85 -> digits; array close ']'; enum first char 'a' (accept);
    # reasoning string 'ok"'.
    script = ["8", "5", EOS + 1,          # third int step: no digit, conclude
              "]",                        # segments: close immediately
              "a",                        # verdict: accept
              "o", "k", '"']              # reasoning
    drive(session, script)
    obj, complete = session.result()
    assert complete
    result = CriticResult.model_validate(obj)
    assert result.overall_confidence == 85
    assert result.verdict == "accept"
    assert result.reasoning == "ok"
    assert result.segments == []


def test_critic_nested_segments():
    session = session_for(CriticResult)
    script = ["7", "0", "x",              # confidence 70 (x concludes int)
              "{",                        # segments: open one element
              "h", "i", '"',              # segment.text = "hi"
              "9", "0", "x",              # segment.confidence 90
              "{",                        # issues: one element
              "b", "a", "d", '"',         # issue.description
              "m",                        # severity: minor
              "f", "i", "x", '"',         # suggestion
              "]",                        # close issues
              "]",                        # close segments
              "n",                        # verdict: needs_editing/needs_reocr
              '"']                        # reasoning = ""
    drive(session, script)
    obj, complete = session.result()
    assert complete
    result = CriticResult.model_validate(obj)
    assert result.overall_confidence == 70
    assert len(result.segments) == 1
    assert result.segments[0].text == "hi"
    assert result.segments[0].confidence == 90
    assert result.segments[0].issues[0].description == "bad"
    assert result.segments[0].issues[0].severity == "minor"
    assert result.segments[0].issues[0].suggestion == "fix"


def test_editor_drive_with_escapes():
    session = session_for(EditorResult)
    script = ["l", "1", "\\", '"', "q", '"',   # corrected_text = 'l1"q'
              "]",                              # changes: none
              "]"]                              # unresolved: none
    drive(session, script)
    obj, complete = session.result()
    assert complete
    result = EditorResult.model_validate(obj)
    assert result.corrected_text == 'l1"q'
    assert result.changes == [] and result.unresolved == []


def test_arbitrator_string_array():
    session = session_for(ArbitratorResult)
    script = ["o", "k", '"',              # final_text
              "]",                        # decisions
              "9", "9", "x",              # confidence
              '"',                        # uncertain_segments: open element
              "a", '"',                   # element "a"
              ",",                        # continue
              "b", '"',                   # element "b"
              "]"]                        # close
    drive(session, script)
    obj, complete = session.result()
    assert complete
    result = ArbitratorResult.model_validate(obj)
    assert result.final_text == "ok"
    assert result.confidence == 99
    assert result.uncertain_segments == ["a", "b"]


def test_int_clamped_to_bounds():
    session = session_for(CriticResult)
    # 999 exceeds le=100 -> max_digits=3 consumed then clamped.
    drive(session, ["9", "9", "9", "]", "a", '"'])
    obj, complete = session.result()
    assert complete
    assert CriticResult.model_validate(obj).overall_confidence == 100


def test_eos_mid_string_fills_defaults():
    """EOS during the first value: remaining fields default-fill; all
    CriticResult fields have defaults, so the object still validates."""
    session = session_for(CriticResult)
    drive(session, ["4", "2", EOS])       # EOS right after the int
    obj, complete = session.result()
    assert complete                       # every field has a default
    result = CriticResult.model_validate(obj)
    assert result.overall_confidence == 42
    assert result.segments == [] and result.reasoning == ""


def test_eos_before_required_field_reports_incomplete():
    """EditorResult.corrected_text is required: EOS before it completes
    -> partial string IS kept; EOS before the field -> incomplete."""
    session = session_for(EditorResult)
    drive(session, ["p", "a", "r", EOS])  # dies inside corrected_text
    obj, complete = session.result()
    assert complete                       # partial value present
    assert EditorResult.model_validate(obj).corrected_text == "par"


def test_budget_death_still_validates():
    session = session_for(CriticResult, max_tokens=9)
    drive(session, ["8", "5", "x", "{", "l", "o", "n", "g"] * 50)
    obj, complete = session.result()
    assert complete
    CriticResult.model_validate(obj)


def test_array_cap():
    """Runaway 'continue' decisions stop at the element cap."""
    session = session_for(ArbitratorResult)
    script = ["t", '"', "]", "1", "x"] + ['"', "s", '"', ","] * 40
    drive(session, script)
    obj, complete = session.result()
    assert complete
    result = ArbitratorResult.model_validate(obj)
    assert len(result.uncertain_segments) <= 16


def test_array_cap_records_truncation(capsys):
    """Hitting the item ceiling is recorded + logged (no silent caps)."""
    session = session_for(ArbitratorResult)
    script = ["t", '"', "]", "1", "x"] + ['"', "s", '"', ","] * 40
    drive(session, script)
    obj, complete = session.result()
    assert complete
    if len(ArbitratorResult.model_validate(obj).uncertain_segments) == 16:
        assert "uncertain_segments" in session.truncated_arrays
        assert "[schema]" in capsys.readouterr().out


def test_integer_no_digit_in_topk_property():
    """Property: when NO digit token ever appears in the top-k during an
    integer span, the field concludes to its default/lower bound and the
    final object still validates — for many random junk scripts."""
    import random
    rng = random.Random(7)
    letters = "abcdefghijklmnopqrstuvwxyz{}:,![]"
    for trial in range(25):
        session = session_for(CriticResult)
        junk = [rng.choice(letters) for _ in range(rng.randint(1, 6))]
        # integer span sees only junk; then close segments, enum, string.
        script = junk[:1] + ["]", "a", "x", '"']
        drive(session, script)
        obj, complete = session.result()
        assert complete, trial
        result = CriticResult.model_validate(obj)
        assert result.overall_confidence == 0, trial  # lo bound / default
