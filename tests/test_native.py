"""Native C++ kernels: bit-parity with the NumPy engines + build fallback."""

import numpy as np
import pytest

from handwritten_ocr_tpu import native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib failed to build")


@needs_native
def test_edit_distance_parity_fuzz():
    from handwritten_ocr_tpu.text.metrics import edit_distance_ids
    rng = np.random.default_rng(0)
    for _ in range(200):
        a = rng.integers(0, 6, rng.integers(0, 40)).astype(np.uint32)
        b = rng.integers(0, 6, rng.integers(0, 40)).astype(np.uint32)
        # edit_distance_ids dispatches to native when available; compare
        # against a scalar DP oracle instead.
        n, m = len(a), len(b)
        dp = np.zeros((n + 1, m + 1), dtype=int)
        dp[:, 0] = np.arange(n + 1)
        dp[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                               dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        assert native.edit_distance_u32(a, b) == dp[n, m]
        assert edit_distance_ids(a, b) == dp[n, m]


@needs_native
def test_edit_distance_empty():
    empty = np.array([], dtype=np.uint32)
    abc = np.array([1, 2, 3], dtype=np.uint32)
    assert native.edit_distance_u32(empty, empty) == 0
    assert native.edit_distance_u32(empty, abc) == 3
    assert native.edit_distance_u32(abc, empty) == 3


@needs_native
def test_lcs_align_matches_python_backtrack():
    from handwritten_ocr_tpu.text.merge import _lcs_rows
    rng = np.random.default_rng(1)
    for _ in range(100):
        a = rng.integers(0, 5, rng.integers(0, 25)).astype(np.int64)
        b = rng.integers(0, 5, rng.integers(0, 25)).astype(np.int64)
        idx = native.lcs_align(a, b)
        # Python reference backtrack with the identical tie-break.
        table = _lcs_rows(a, b)
        expected = np.full(len(a), -1, dtype=np.int64)
        i, j = len(a), len(b)
        while i > 0 and j > 0:
            if a[i - 1] == b[j - 1]:
                expected[i - 1] = j - 1
                i -= 1
                j -= 1
            elif table[i - 1, j] >= table[i, j - 1]:
                i -= 1
            else:
                j -= 1
        np.testing.assert_array_equal(idx, expected)


def test_merge_versions_same_with_and_without_native(monkeypatch):
    """merge_versions output is identical on both code paths."""
    import handwritten_ocr_tpu.text.merge as merge_mod
    versions = ["the quick brown fox jumps", "The quick brown fax jumps",
                "the quick  brown fox"]
    with_native = merge_mod.merge_versions(versions)
    monkeypatch.setattr(merge_mod, "_native_lcs_align", None)
    without = merge_mod.merge_versions(versions)
    assert with_native == without


def test_no_native_env_fallback(monkeypatch):
    """metrics work when the native path is disabled."""
    from handwritten_ocr_tpu.text.metrics import levenshtein
    import handwritten_ocr_tpu.text.metrics as metrics_mod
    monkeypatch.setattr(metrics_mod, "_native_edit_distance", None)
    assert levenshtein("kitten", "sitting") == 3
