"""Paged KV cache + continuous batching vs the dense decode path.

The invariant: for any mix of prompts/budgets, the batcher's greedy tokens
bit-match running each request alone through the dense ``generate`` —
paging, slot reuse, right-padded prefill, chunked decode, and mid-stream
admission/retirement must all be invisible to the numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handwritten_ocr_tpu.engine.serving import (
    ContinuousBatcher,
    GenRequest,
    PagedProgram,
)
from handwritten_ocr_tpu.models.init import init_qwen3
from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model


@pytest.fixture(scope="module")
def tiny():
    cfg = Qwen3Config(vocab_size=256, hidden_size=48, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=6,
                      num_key_value_heads=2, head_dim=8,
                      eos_token_id=0, pad_token_id=0)
    params = init_qwen3(jax.random.PRNGKey(11), cfg, dtype=jnp.float32)
    return params, cfg


def dense_tokens(params, cfg, prompt, max_new):
    """Reference: B=1 dense decode, eos-trimmed token list."""
    model = Qwen3Model(params, cfg)
    gen = model.generate(np.asarray([prompt], np.int32), max_new)
    length = int(np.asarray(gen.lengths)[0])
    return np.asarray(gen.tokens)[0, :length].tolist()


def make_batcher(params, cfg, **kw):
    kw.setdefault("n_slots", 2)
    kw.setdefault("block_size", 8)
    kw.setdefault("max_context", 96)
    kw.setdefault("chunk", 5)
    kw.setdefault("prefill_bucket", 16)
    kw.setdefault("dtype", jnp.float32)
    return ContinuousBatcher(PagedProgram(params, cfg), **kw)


def test_paged_matches_dense(tiny):
    """4 mixed-length requests through 2 slots == 4 solo dense decodes."""
    params, cfg = tiny
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 250, size=n).tolist()
               for n in (5, 11, 19, 3)]
    budgets = [12, 7, 12, 9]
    expected = [dense_tokens(params, cfg, p, b)[:b]
                for p, b in zip(prompts, budgets)]

    batcher = make_batcher(params, cfg)
    requests = [GenRequest(np.asarray(p, np.int32), b)
                for p, b in zip(prompts, budgets)]
    got = batcher.run(requests)
    assert got == expected


def test_paged_prefill_flash_interpret_matches(tiny, monkeypatch):
    """The fresh-prefill flash path (TPU fast path, exercised here via the
    Pallas interpreter) decodes identically to the gather path."""
    params, cfg = tiny
    prompt = np.asarray([5, 9, 2, 77, 31, 8, 14], np.int32)
    expected = dense_tokens(params, cfg, prompt.tolist(), 6)[:6]
    monkeypatch.setenv("HOCR_TPU_FLASH", "interpret")
    batcher = make_batcher(params, cfg)
    [got] = batcher.run([GenRequest(prompt, 6)])
    assert got == expected


def test_slot_and_block_reuse(tiny):
    """More requests than slots: retirement frees slots/blocks for the
    queue; the pool never leaks."""
    params, cfg = tiny
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 250, size=rng.integers(3, 24)).tolist()
               for _ in range(7)]
    batcher = make_batcher(params, cfg)
    total_blocks = len(batcher._free_blocks)
    requests = [GenRequest(np.asarray(p, np.int32), 6) for p in prompts]
    got = batcher.run(requests)
    for prompt, tokens in zip(prompts, got):
        assert tokens == dense_tokens(params, cfg, prompt, 6)[:6]
    assert len(batcher._free_blocks) == total_blocks      # all freed
    assert len(batcher._free_slots) == batcher.n_slots
    assert not batcher._slot_req


def test_streaming_callbacks(tiny):
    """on_tokens streams incrementally; concatenation == final result."""
    params, cfg = tiny
    prompt = np.asarray([7, 3, 99, 14], np.int32)
    seen: list[list[int]] = []
    flags: list[bool] = []
    request = GenRequest(prompt, 11,
                         on_tokens=lambda t, d: (seen.append(list(t)),
                                                 flags.append(d)))
    batcher = make_batcher(params, cfg)
    [got] = batcher.run([request])
    assert [t for chunk in seen for t in chunk] == got
    assert flags[-1] is True and not any(flags[:-1])
    # chunk=5, 11 tokens: prefill(1) + chunks -> at least 3 deliveries
    assert len(seen) >= 3


def test_early_eos_frees_budget(tiny):
    """A request whose decode hits EOS stops early, returns the trimmed
    sequence, and releases its blocks (continuous batching's whole point:
    finished pages stop paying the longest page's budget)."""
    params, cfg = tiny
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, 250, size=9).tolist()
    # Probe: find what the model actually emits, then declare the 4th
    # generated token to be EOS so the decode genuinely terminates early.
    probe = dense_tokens(params, cfg, prompt, 16)
    eos = probe[3]
    cfg_eos = Qwen3Config(**{**{f.name: getattr(cfg, f.name)
                                for f in cfg.__dataclass_fields__.values()},
                             "eos_token_id": int(eos)})
    expected = dense_tokens(params, cfg_eos, prompt, 16)
    assert len(expected) == 3                              # stops at eos

    batcher = make_batcher(params, cfg_eos)
    [got] = batcher.run([GenRequest(np.asarray(prompt, np.int32), 16)])
    assert got == expected
    assert len(batcher._free_slots) == batcher.n_slots


def test_table_width_ladder(tiny):
    """The width ladder picks the narrowest power-of-two page count
    covering live lengths (+margin), and narrow-table decode bit-matches
    dense — including a mid-decode width transition."""
    params, cfg = tiny
    batcher = make_batcher(params, cfg, max_context=512, n_slots=2,
                           block_size=8)                  # 64-page tables
    batcher._host_len[0] = 40                             # 5 blocks live
    assert batcher._table_pages([0], margin=6) == 8       # ceil(46/8)=6 -> 8
    batcher._host_len[1] = 120                            # 15 blocks
    assert batcher._table_pages([0, 1], margin=6) == 16
    batcher._host_len[1] = 500                            # beyond ladder
    assert batcher._table_pages([0, 1], margin=6) is None  # full table
    assert batcher._table_pages([], margin=6) is None

    # End-to-end: prompt 30 + 60 new tokens crosses the 8-page (64-token)
    # width boundary mid-decode; tokens must still bit-match dense.
    rng = np.random.default_rng(7)
    prompt = rng.integers(1, 250, size=30).tolist()
    expected = dense_tokens(params, cfg, prompt, 60)[:60]
    fresh = make_batcher(params, cfg, max_context=512, n_slots=2,
                         block_size=8)
    [got] = fresh.run([GenRequest(np.asarray(prompt, np.int32), 60)])
    assert got == expected


def test_ngram_draft():
    from handwritten_ocr_tpu.engine.serving import _ngram_draft
    ctx = np.array([5, 6, 7, 8, 9, 1, 2, 5, 6, 7], np.int32)
    # suffix trigram (5,6,7) matches at position 0 -> continuation 8,9,1...
    assert _ngram_draft(ctx, 3).tolist() == [8, 9, 1]
    assert _ngram_draft(ctx, 8).tolist() == [8, 9, 1, 2, 5, 6, 7]
    # no bigram/trigram recurrence -> empty
    assert len(_ngram_draft(np.arange(10, dtype=np.int32), 4)) == 0
    # prefers the LAST occurrence
    ctx2 = np.array([1, 2, 3, 1, 2, 4, 1, 2], np.int32)
    assert _ngram_draft(ctx2, 2).tolist() == [4, 1]


def test_speculative_matches_dense(tiny):
    """Speculative verify is greedy-invisible AND actually accepts:
    drafts fed from the dense continuation (the ``draft_oracle`` harness
    hook — on CPU verify and step share numerics, so every oracle draft
    must be accepted) decode to exactly the dense tokens. Prompt-lookup
    drafting itself is unit-tested above; whether a random-weight
    continuation happens to revisit an n-gram is RNG luck, so the
    verify-path test must not depend on it."""
    params, cfg = tiny
    rng = np.random.default_rng(3)
    base = rng.integers(1, 250, size=6)
    prompts = [np.tile(base, 5).astype(np.int32),
               rng.integers(1, 250, size=23).astype(np.int32),
               np.tile(rng.integers(1, 250, size=4), 8).astype(np.int32)]
    budgets = [20, 14, 17]
    expected = [dense_tokens(params, cfg, p.tolist(), b)[:b]
                for p, b in zip(prompts, budgets)]
    batcher = make_batcher(params, cfg, max_context=192, draft_k=6)
    requests = [GenRequest(p, b, speculate=True,
                           draft_oracle=np.asarray(e, np.int32))
                for p, b, e in zip(prompts, budgets, expected)]
    got = batcher.run(requests)
    assert got == expected
    assert batcher.spec_stats["rounds"] > 0
    assert batcher.spec_stats["accepted"] == batcher.spec_stats["drafted"]


def test_speculative_mixed_with_plain(tiny):
    """Speculating and plain requests share the batch; both bit-match."""
    params, cfg = tiny
    rng = np.random.default_rng(4)
    rep = np.tile(rng.integers(1, 250, size=5), 6).astype(np.int32)
    plain = rng.integers(1, 250, size=11).astype(np.int32)
    expected = [dense_tokens(params, cfg, rep.tolist(), 15)[:15],
                dense_tokens(params, cfg, plain.tolist(), 15)[:15]]
    batcher = make_batcher(params, cfg, max_context=192, draft_k=5)
    got = batcher.run([GenRequest(rep, 15, speculate=True),
                       GenRequest(plain, 15)])
    assert got == expected


def test_pool_too_small_raises(tiny):
    params, cfg = tiny
    batcher = make_batcher(params, cfg, n_blocks=3)        # 2 usable blocks
    request = GenRequest(np.arange(1, 30, dtype=np.int32), 40)
    with pytest.raises(RuntimeError, match="KV blocks"):
        batcher.run([request])


# ── engine integration: paged serving == dense path ─────────────────

def test_ocr_backend_paged_matches_dense(tmp_path):
    """JaxOCRBackend's default paged read (vision splice + M-RoPE decode
    through the batcher) == the contiguous-cache generate path."""
    import sys
    sys.path.insert(0, "tests")
    from PIL import Image as PILImage
    from test_engines import tiny_vl_model
    from handwritten_ocr_tpu.engine.jax_engines import (
        JaxOCRBackend, TPUPreprocessor)
    from handwritten_ocr_tpu.models.processor import ByteTokenizer

    rng = np.random.default_rng(0)
    arr = rng.integers(120, 256, (60, 80, 3), dtype=np.uint8)
    path = tmp_path / "p.png"
    PILImage.fromarray(arr).save(path)
    prep = TPUPreprocessor(min_pixels=28 * 28, max_pixels=56 * 56)
    imgs = [prep.apply(str(path), ["sharpen"]),
            prep.apply(str(path), ["high_contrast"]),
            prep.apply(str(path), ["binarize"])]

    model = tiny_vl_model()
    dense = JaxOCRBackend(model, ByteTokenizer(), min_pixels=28 * 28,
                          max_pixels=56 * 56, serving="dense")
    paged = JaxOCRBackend(model, ByteTokenizer(), min_pixels=28 * 28,
                          max_pixels=56 * 56, serving="paged")
    expected = dense.read_batch(imgs, "Extract.", 7)
    assert paged.read_batch(imgs, "Extract.", 7) == expected


def test_schema_constrained_chat_always_validates(tiny):
    """Property: schema-constrained chat output ALWAYS validates against
    the pydantic contract, even from a random-weight model — the scaffold
    is forced and every value span is type-constrained (ref tools.py:270-
    276 semantics, strictly stronger)."""
    import json
    from handwritten_ocr_tpu.agents.schemas import (
        ArbitratorResult, CriticResult, EditorResult)
    from handwritten_ocr_tpu.engine.jax_engines import JaxReasoningBackend
    from handwritten_ocr_tpu.models.processor import ByteTokenizer
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Model

    params, cfg = tiny
    cfg_big = Qwen3Config(**{**{f.name: getattr(cfg, f.name)
                                for f in cfg.__dataclass_fields__.values()},
                             "vocab_size": 152000})
    params = init_qwen3(jax.random.PRNGKey(13), cfg_big, dtype=jnp.float32)
    backend = JaxReasoningBackend(Qwen3Model(params, cfg_big),
                                  ByteTokenizer())

    for model_cls in (CriticResult, EditorResult, ArbitratorResult):
        text = backend.chat("critic sys", "review this",
                            temperature=0.1, max_tokens=96,
                            json_schema=model_cls.model_json_schema())
        model_cls.model_validate(json.loads(text))   # must not raise


def test_schema_constrained_chat_batch(tiny):
    """Batched constrained decode: every row validates; rows match the
    single-call constrained output (same greedy choices)."""
    import json
    from handwritten_ocr_tpu.agents.schemas import CriticResult
    from handwritten_ocr_tpu.engine.jax_engines import JaxReasoningBackend
    from handwritten_ocr_tpu.models.processor import ByteTokenizer
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Model

    params, cfg = tiny
    cfg_big = Qwen3Config(**{**{f.name: getattr(cfg, f.name)
                                for f in cfg.__dataclass_fields__.values()},
                             "vocab_size": 152000})
    params = init_qwen3(jax.random.PRNGKey(13), cfg_big, dtype=jnp.float32)
    schema = CriticResult.model_json_schema()

    class Req:
        schema = None

        def __init__(self, system, user):
            self.system, self.user = system, user

    reqs = [Req("sys", "page one text"), Req("sys", "a different page")]
    backend = JaxReasoningBackend(Qwen3Model(params, cfg_big),
                                  ByteTokenizer())
    batch = backend.chat_batch(reqs, temperature=0.1, max_tokens=96,
                               json_schema=schema)
    for text in batch:
        CriticResult.model_validate(json.loads(text))
    solo = [backend.chat(r.system, r.user, temperature=0.1, max_tokens=96,
                         json_schema=schema) for r in reqs]
    assert batch == solo


def test_guided_decode_chunk_invariance(tiny):
    """Schema-guided output is identical whatever the string-chunk size —
    the chunked device span loop and per-token host stepping are the same
    decoder (chunk=1 degenerates to per-token)."""
    import json
    from handwritten_ocr_tpu.agents.schemas import CriticResult
    from handwritten_ocr_tpu.engine.serving import PagedProgram
    from handwritten_ocr_tpu.models.processor import ByteTokenizer

    params, cfg = tiny
    cfg_big = Qwen3Config(**{**{f.name: getattr(cfg, f.name)
                                for f in cfg.__dataclass_fields__.values()},
                             "vocab_size": 152000})
    params = init_qwen3(jax.random.PRNGKey(13), cfg_big, dtype=jnp.float32)
    tok = ByteTokenizer()
    schema = CriticResult.model_json_schema()
    prompt = np.asarray(tok.encode("<|im_start|>user\ncheck<|im_end|>\n"),
                        np.int32)

    outcomes = []
    for chunk in (1, 4, 9):
        batcher = ContinuousBatcher(
            PagedProgram(params, cfg_big), n_slots=2, block_size=8,
            max_context=256, chunk=chunk, prefill_bucket=16,
            dtype=jnp.float32)
        [(obj, complete)] = batcher.run_guided(
            [GenRequest(prompt, 80)], schema, tok)
        assert complete and obj is not None
        CriticResult.model_validate(obj)
        outcomes.append(json.dumps(obj, sort_keys=True))
    assert outcomes[0] == outcomes[1] == outcomes[2]


def test_guided_speculation_invariance(tiny):
    """Schema-guided output is identical with and without prompt-lookup
    speculation in the string value spans (greedy-invisible), and the
    verify path actually fires on a copy-friendly prompt."""
    import json
    from handwritten_ocr_tpu.agents.schemas import EditorResult
    from handwritten_ocr_tpu.engine.serving import PagedProgram
    from handwritten_ocr_tpu.models.processor import ByteTokenizer

    params, cfg = tiny
    cfg_big = Qwen3Config(**{**{f.name: getattr(cfg, f.name)
                                for f in cfg.__dataclass_fields__.values()},
                             "vocab_size": 152000})
    params = init_qwen3(jax.random.PRNGKey(13), cfg_big, dtype=jnp.float32)
    tok = ByteTokenizer()
    schema = EditorResult.model_json_schema()
    # Repetitive prompt text = n-gram index hits inside string spans.
    prompt = np.asarray(tok.encode("fix: " + "the cat sat. " * 6),
                        np.int32)

    outcomes = []
    stats = []
    for speculate in (False, True):
        batcher = ContinuousBatcher(
            PagedProgram(params, cfg_big), n_slots=2, block_size=8,
            max_context=512, chunk=6, draft_k=6, prefill_bucket=16,
            dtype=jnp.float32)
        [(obj, complete)] = batcher.run_guided(
            [GenRequest(prompt, 120, speculate=speculate)], schema, tok)
        assert complete and obj is not None
        EditorResult.model_validate(obj)
        outcomes.append(json.dumps(obj, sort_keys=True))
        stats.append(dict(batcher.spec_stats))
    assert outcomes[0] == outcomes[1]
    assert stats[0]["rounds"] == 0


def test_reasoning_backend_paged_matches_dense(tiny):
    from handwritten_ocr_tpu.engine.jax_engines import JaxReasoningBackend
    from handwritten_ocr_tpu.models.processor import ByteTokenizer
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Model

    params, cfg = tiny
    # ByteTokenizer specials exceed this tiny vocab; remap eos in range.
    cfg_big = Qwen3Config(**{**{f.name: getattr(cfg, f.name)
                                for f in cfg.__dataclass_fields__.values()},
                             "vocab_size": 152000})
    params = init_qwen3(jax.random.PRNGKey(11), cfg_big, dtype=jnp.float32)

    class Req:
        def __init__(self, system, user):
            self.system, self.user = system, user

    reqs = [Req("sys", "short"), Req("sys", "a much longer user message "
                                            "that lands in another bucket")]
    dense = JaxReasoningBackend(Qwen3Model(params, cfg_big), ByteTokenizer(),
                                serving="dense")
    paged = JaxReasoningBackend(Qwen3Model(params, cfg_big), ByteTokenizer(),
                                serving="paged")
    expected = dense.chat_batch(reqs, temperature=0.1, max_tokens=6)
    assert paged.chat_batch(reqs, temperature=0.1, max_tokens=6) == expected
    # Single-call path too.
    solo_dense = dense.chat("sys", "short", temperature=0.1, max_tokens=6)
    solo_paged = paged.chat("sys", "short", temperature=0.1, max_tokens=6)
    assert solo_paged == solo_dense


def test_prefill_group_token_cap(tiny):
    """Admission prefills split into sub-groups bounded by
    PREFILL_GROUP_TOKENS padded tokens (wide admissions at long buckets
    must not spike activation memory) — and decode still bit-matches."""
    params, cfg = tiny
    rng = np.random.default_rng(9)
    prompts = [rng.integers(1, 250, size=14).astype(np.int32)
               for _ in range(4)]
    expected = [dense_tokens(params, cfg, p.tolist(), 6)[:6]
                for p in prompts]
    batcher = make_batcher(params, cfg, n_slots=4, max_context=64)
    batcher.PREFILL_GROUP_TOKENS = 16      # one 16-bucket row per group
    calls = []
    real = batcher.program.prefill

    def spy(cache, embeds, *args):
        calls.append(embeds.shape[0])
        return real(cache, embeds, *args)

    batcher.program.prefill = spy
    got = batcher.run([GenRequest(p, 6) for p in prompts])
    assert got == expected
    assert calls and max(calls) == 1       # every group capped to 1 row


def test_quantized_fallback_serving_smoke(tiny):
    """int8-KV serving runs end-to-end on the portable fallback: valid
    tokens out, and the quantized pool dequantizes to ~the bf16 pool's
    values (the quality contract the TPU default relies on)."""
    params, cfg = tiny
    rng = np.random.default_rng(12)
    prompts = [rng.integers(1, 250, size=n).astype(np.int32)
               for n in (9, 14)]
    exact = make_batcher(params, cfg)
    quant = make_batcher(params, cfg, kv_quant=True)
    out_exact = exact.run([GenRequest(p, 8) for p in prompts])
    out_quant = quant.run([GenRequest(p, 8) for p in prompts])
    assert all(len(t) == 8 for t in out_quant)
    # Token-level agreement is expected but not guaranteed (quantization
    # perturbs near-ties); the pools themselves must round-trip closely.
    agree = sum(a == b for ta, tb in zip(out_exact, out_quant)
                for a, b in zip(ta, tb))
    assert agree >= 12, (agree, out_exact, out_quant)
    deq = (np.asarray(quant.cache.k, np.float32)
           * np.asarray(quant.cache.k_scale).transpose(0, 1, 3, 2)[..., None])
    ref = np.asarray(exact.cache.k, np.float32)
    live = np.abs(ref) > 0
    err = np.abs(deq - ref)[live].max() if live.any() else 0.0
    assert err < 0.05, err


def test_stop_mask_disk_cache(tmp_path, monkeypatch):
    """The string-stop mask persists across processes via the disk cache
    (keyed by tokenizer identity) and never re-decodes the vocab."""
    from handwritten_ocr_tpu.engine import serving as srv
    from handwritten_ocr_tpu.models.processor import ByteTokenizer

    monkeypatch.setenv("HOCR_CACHE_DIR", str(tmp_path))

    class NamedTok(ByteTokenizer):
        name_or_path = "toy/byte-tokenizer"

    tok = NamedTok()
    vocab, eos = 300, 299
    mask = srv._string_stop_mask(tok, vocab, eos)
    assert mask[ord('"')] and mask[eos] and not mask[ord("a")]
    files = list(tmp_path.glob("stop_mask_*.npy"))
    assert len(files) == 1

    # A fresh process (simulated: cleared in-memory cache) must hit disk,
    # not decode: poison decode to prove it.
    srv._STOP_MASK_CACHE.clear()

    class PoisonTok(NamedTok):
        def decode(self, ids):
            raise AssertionError("decoded despite disk cache")

    mask2 = srv._string_stop_mask(PoisonTok(), vocab, eos)
    assert (mask2 == mask).all()
