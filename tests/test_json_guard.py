"""JSON viability scanner: exhaustive prefix/complete behavior."""

import json
import random
import string

import pytest

from handwritten_ocr_tpu.utils.json_guard import (
    JsonScanner,
    is_complete,
    is_viable_prefix,
)

VALID_DOCS = [
    '{}', '[]', '{"a": 1}', '[1, 2, 3]', '"hello"', 'true', 'false', 'null',
    '42', '-3.14', '1e10', '0', '{"a": {"b": [1, "x", null]}, "c": false}',
    '{"s": "with \\"escape\\" and } brace"}', '[[], {}, [{}]]',
    '{"overall_confidence": 88, "segments": [], "verdict": "accept"}',
    '  {"padded": true}  ', '"\\u00e9"', '[true, false]', '{"k": -0.5e-2}',
]

INVALID_PREFIXES = [
    '}', ']', '{,', '{"a" 1}', '{"a":}1', '[1 2', '{"a": 1,,', 'truex',
    'nul{', '01', '{"a": 01}', '-{', '[,', '{"a": "b" "c"', '{"a"}',
    '1 2', '"done" extra', '{} {}', '[1] null',
]


@pytest.mark.parametrize("doc", VALID_DOCS)
def test_valid_docs_all_prefixes_viable(doc):
    json.loads(doc)  # sanity: actually valid
    for i in range(len(doc) + 1):
        assert is_viable_prefix(doc[:i]), f"prefix {doc[:i]!r} flagged dead"
    assert is_complete(doc)


@pytest.mark.parametrize("bad", INVALID_PREFIXES)
def test_invalid_inputs_rejected(bad):
    # The full bad string must be either non-viable or viable-but-incomplete
    # in a way json.loads also rejects.
    if is_viable_prefix(bad):
        assert not is_complete(bad)
        with pytest.raises(json.JSONDecodeError):
            json.loads(bad)
    else:
        with pytest.raises(json.JSONDecodeError):
            json.loads(bad)


def test_incomplete_docs_viable_but_not_complete():
    for prefix in ['{', '{"a"', '{"a":', '[1,', '"unterminated', '-', '1e',
                   '{"a": [tru']:
        assert is_viable_prefix(prefix), prefix
        assert not is_complete(prefix), prefix


def test_scanner_incremental_matches_batch():
    doc = '{"a": [1, {"b": "x"}], "c": null}'
    scanner = JsonScanner()
    for ch in doc:
        assert scanner.feed(ch)
    assert scanner.complete()


def test_dead_scanner_stays_dead():
    scanner = JsonScanner()
    assert not scanner.feed("}")
    assert not scanner.feed("{")
    assert not scanner.viable()


def test_fuzz_against_json_loads():
    """Every complete-marked string must parse; every parseable string must
    have all-viable prefixes and be complete-marked."""
    rng = random.Random(0)
    alphabet = '{}[]",:0123456789.eE+-truefalsnul \n' + string.ascii_lowercase
    agree = 0
    for _ in range(3000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 12)))
        parses = True
        try:
            json.loads(s)
        except Exception:
            parses = False
        if is_complete(s):
            assert parses, f"complete-marked but unparseable: {s!r}"
        if parses:
            assert is_complete(s), f"parseable but not complete-marked: {s!r}"
            assert all(is_viable_prefix(s[:i]) for i in range(len(s) + 1))
            agree += 1
    assert agree > 10  # fuzz actually produced some valid docs
