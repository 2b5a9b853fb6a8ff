"""Unit + golden tests for the text core (the scoring oracle).

Golden values were minted with scripts/check_against_reference.py, which
fuzz-verified 500 random cases bit-identical against the reference
implementation (/root/reference/ocr_agent/tools.py).
"""

import numpy as np
import pytest

from handwritten_ocr_tpu.text import (
    cer,
    compare_versions,
    levenshtein,
    merge_versions,
    normalize_text,
    parse_ground_truth,
    tier1_metrics,
    wer,
    word_levenshtein,
)
from handwritten_ocr_tpu.text.metrics import edit_distance_ids
from handwritten_ocr_tpu.text.merge import align_to_backbone


# ── normalize_text ──────────────────────────────────────────────────

def test_normalize_folds_punctuation_and_whitespace():
    assert normalize_text("“Hello” — it’s\n\ta ‘test’ –ok") == "\"Hello\" - it's a 'test' -ok"


def test_normalize_lower():
    assert normalize_text("  A  B\nC ", lower=True) == "a b c"


def test_normalize_empty():
    assert normalize_text("") == ""
    assert normalize_text(" \n\t ") == ""


# ── levenshtein ─────────────────────────────────────────────────────

@pytest.mark.parametrize("a,b,d", [
    ("", "", 0),
    ("abc", "", 3),
    ("", "abc", 3),
    ("kitten", "sitting", 3),
    ("flaw", "lawn", 2),
    ("abc", "abc", 0),
    ("intention", "execution", 5),
    ("a", "b", 1),
])
def test_levenshtein_known_values(a, b, d):
    assert levenshtein(a, b) == d


def test_levenshtein_unicode():
    assert levenshtein("naïve", "naive") == 1
    assert levenshtein("日本語", "日本誤") == 1


def test_levenshtein_matches_scalar_reference_dp():
    # Property check against an independent scalar DP oracle.
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = "".join(rng.choice(list("abcd "), size=rng.integers(0, 30)))
        b = "".join(rng.choice(list("abcd "), size=rng.integers(0, 30)))
        n, m = len(a), len(b)
        dp = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(n + 1):
            dp[i][0] = i
        for j in range(m + 1):
            dp[0][j] = j
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                               dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        assert levenshtein(a, b) == dp[n][m]


def test_word_levenshtein():
    assert word_levenshtein(["a", "b", "c"], ["a", "x", "c"]) == 1
    assert word_levenshtein([], ["a"]) == 1
    assert word_levenshtein(["a", "b"], ["b", "a"]) == 2


def test_edit_distance_ids_dtype_safety():
    a = np.array([1, 2, 3], dtype=np.uint32)
    b = np.array([1, 3], dtype=np.uint32)
    assert edit_distance_ids(a, b) == 1


# ── cer / wer / tier1 ───────────────────────────────────────────────

def test_cer_wer_basic():
    assert cer("abc", "abc") == 0.0
    assert cer("abcd", "abcx") == 0.25
    assert wer("a b c d", "a b x d") == 0.25


def test_cer_empty_gt_guard():
    assert cer("", "abc") == 3.0  # divides by max(len(gt),1) == 1


def test_tier1_metrics_golden():
    # Golden case fuzz-verified bit-identical vs reference tools.py:119-139.
    got = tier1_metrics("The quick — brown fox.", "Teh quick - brown “fox”.")
    assert got == {
        "input": "Teh quick - brown “fox”.",
        "cer": round(4 / 22, 4),
        "wer": round(4 / 22, 4),
        "wer_token": 0.4,
        "exact_match": False,
        "gt_chars": 22,
        "ocr_chars": 24,
    }


def test_tier1_exact_match():
    got = tier1_metrics("same  text", "same\ntext")
    assert got["exact_match"] is True
    assert got["cer"] == 0.0 and got["wer_token"] == 0.0


# ── compare_versions ────────────────────────────────────────────────

def test_compare_identical():
    out = compare_versions("hello world", "hello  world")
    assert out["agreement_rate"] == 100.0
    assert out["char_edit_distance"] == 0
    assert out["word_edit_distance"] == 0
    assert out["differing_segments"] == []


def test_compare_simple_substitution():
    out = compare_versions("the quick brown fox", "the quack brown fox")
    assert out["word_edit_distance"] == 1
    assert out["differing_segments"] == [
        {"position": 1, "v1_text": "quick", "v2_text": "quack"},
    ]


def test_compare_insertion_segment():
    # v2 has an extra word: v2-side lookahead resyncs on "brown".
    out = compare_versions("the brown fox", "the very brown fox")
    assert out["differing_segments"] == [
        {"position": 1, "v1_text": "", "v2_text": "very"},
    ]


def test_compare_tail_segment():
    out = compare_versions("a b c d e", "a b c")
    assert out["differing_segments"] == [
        {"position": 3, "v1_text": "d e", "v2_text": ""},
    ]


def test_compare_agreement_rate_rounding():
    out = compare_versions("abcdefghij", "abcdefghix")
    assert out["agreement_rate"] == 90.0


def test_compare_v1_lookahead_preference():
    # Golden: v1-side lookahead is checked before v2-side at each depth
    # (reference tools.py:367-385 ordering).
    out = compare_versions("x a b", "a b")
    assert out["differing_segments"] == [
        {"position": 0, "v1_text": "x", "v2_text": ""},
    ]


# ── merge_versions ──────────────────────────────────────────────────

def test_merge_degenerate():
    assert merge_versions([]) == ""
    assert merge_versions(["only  one"]) == "only  one"  # single version passes through raw


def test_merge_majority_vote():
    merged = merge_versions([
        "the quick brown fox",
        "the quick brown fax",
        "the quick brown fox",
    ])
    assert merged == "the quick brown fox"


def test_merge_unaligned_words_do_not_vote():
    # "cot" cannot LCS-align to "cat" (alignment needs case-insensitive
    # equality), so position 1 gets only the backbone's own vote.
    # Fuzz-verified identical to reference merge_versions.
    merged = merge_versions(["the cat sat", "the cot sat"])
    assert merged == "the cat sat"


def test_merge_backbone_is_first_longest():
    # Both have 3 words; the first longest version is the backbone, and
    # the divergent word of the other version does not align.
    merged = merge_versions(["a b c", "a b d"])
    assert merged == "a b c"


def test_merge_case_insensitive_alignment_votes_preserve_case():
    # Alignment is case-insensitive but the voted words keep their case;
    # distinct casings of the aligned word become a variant marker.
    merged = merge_versions(["The fox", "the fox"])
    assert merged == "[The|the] fox"


def test_align_to_backbone_gaps():
    aligned = align_to_backbone(["a", "b", "c", "d"], ["a", "c"])
    assert aligned == ["a", None, "c", None]


def test_align_backtrack_tiebreak():
    # Tie-break must prefer stepping the backbone index (reference
    # tools.py:488): aligning "b a" to backbone "a b" matches the "a",
    # not the "b". Fuzz-verified identical to reference _align_to_backbone.
    aligned = align_to_backbone(["a", "b"], ["b", "a"])
    assert aligned == ["a", None]


# ── parse_ground_truth ──────────────────────────────────────────────

def test_parse_ground_truth_with_header(tmp_path):
    f = tmp_path / "gt.md"
    f.write_text("# Title\nintro\n## Ground Truth\n  actual text\nline 2\n")
    assert parse_ground_truth(f) == "actual text\nline 2"


def test_parse_ground_truth_plain_file(tmp_path):
    f = tmp_path / "gt.txt"
    f.write_text("  raw text  ")
    assert parse_ground_truth(f) == "raw text"


def test_parse_ground_truth_missing_and_empty(tmp_path):
    assert parse_ground_truth(tmp_path / "nope.md") is None
    f = tmp_path / "empty.md"
    f.write_text("## Ground Truth\n   \n")
    assert parse_ground_truth(f) is None
