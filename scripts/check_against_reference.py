#!/usr/bin/env python3
"""Differential fuzz check: our text core vs the reference implementation.

Dev-only tool. Loads the reference's pure-text functions (with external deps
stubbed out) and fuzzes both implementations on random inputs, asserting
bit-identical outputs. Used to mint the golden cases hard-coded in
tests/test_text_golden.py; skipped cleanly when /root/reference is absent.
"""

from __future__ import annotations

import importlib.util
import random
import string
import sys
import types
from pathlib import Path

REF = Path("/root/reference/ocr_agent")


def load_reference_tools():
    """Import reference tools.py with ollama/config stubbed."""
    sys.modules.setdefault("ollama", types.ModuleType("ollama"))
    pkg = types.ModuleType("ocr_agent")
    pkg.__path__ = [str(REF)]
    sys.modules["ocr_agent"] = pkg
    for name in ("config", "tools"):
        spec = importlib.util.spec_from_file_location(f"ocr_agent.{name}", REF / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ocr_agent.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ocr_agent.tools"]


WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "note",
    "meeting", "tomorrow", "internalizing", "rn", "m", "cl", "d", "19", "42",
    "don't", "it's", "—", "–", "“quoted”", "‘word’", "",
]


def rand_text(rng: random.Random, max_words: int = 60) -> str:
    n = rng.randrange(0, max_words)
    parts = []
    for _ in range(n):
        if rng.random() < 0.8:
            parts.append(rng.choice(WORDS))
        else:
            parts.append("".join(rng.choice(string.ascii_letters + "   \t\n.,;!?")
                                 for _ in range(rng.randrange(1, 8))))
        if rng.random() < 0.1:
            parts.append(rng.choice(["\n", "\t", "  ", "—", "“"]))
    return " ".join(parts)


def mutate(rng: random.Random, text: str) -> str:
    chars = list(text)
    for _ in range(rng.randrange(0, max(1, len(chars) // 5))):
        op = rng.randrange(3)
        if not chars:
            break
        pos = rng.randrange(len(chars))
        if op == 0:
            chars[pos] = rng.choice(string.ascii_lowercase + " ")
        elif op == 1:
            del chars[pos]
        else:
            chars.insert(pos, rng.choice(string.ascii_lowercase + " "))
    return "".join(chars)


def main() -> None:
    if not REF.exists():
        print("reference not present; nothing to check")
        return
    ref = load_reference_tools()

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from handwritten_ocr_tpu.text import (
        compare_versions, levenshtein, merge_versions, normalize_text,
        tier1_metrics, word_levenshtein,
    )
    from handwritten_ocr_tpu.utils.jsonio import extract_json

    rng = random.Random(20260816)
    n_cases = 500
    for case in range(n_cases):
        a = rand_text(rng)
        b = mutate(rng, a) if rng.random() < 0.6 else rand_text(rng)
        c = mutate(rng, a)

        assert normalize_text(a) == ref.normalize_text(a), (case, "normalize", a)
        assert normalize_text(a, lower=True) == ref.normalize_text(a, lower=True)
        assert levenshtein(a, b) == ref.levenshtein(a, b), (case, "lev", a, b)
        aw, bw = a.split(), b.split()
        assert word_levenshtein(aw, bw) == ref._levenshtein_words(aw, bw)
        assert tier1_metrics(a, b) == ref.tier1_metrics(a, b), (case, "tier1")
        assert compare_versions(a, b) == ref.compare_versions(a, b), (case, "cmp", a, b)
        for versions in ([a], [a, b], [a, b, c]):
            assert merge_versions(versions) == ref.merge_versions(versions), (
                case, "merge", versions)

    json_cases = [
        '{"a": 1}', '```json\n{"a": [1,2]}\n```', 'noise {"x": {"y": 2}} tail',
        'bad { not json } but [1, 2] ok', 'nothing here', '```\n[1,2,3]\n```',
        'pre {broken [5, 6]',
    ]
    for raw in json_cases:
        assert extract_json(raw) == ref.parse_json_response(raw), ("json", raw)

    print(f"OK: {n_cases} fuzz cases + {len(json_cases)} json cases all bit-identical")


if __name__ == "__main__":
    main()
