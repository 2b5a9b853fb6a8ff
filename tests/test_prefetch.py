"""Cross-page primed read batching: cache behavior + pipeline integration."""

import numpy as np

from handwritten_ocr_tpu.config import RunConfig
from handwritten_ocr_tpu.engine.fakes import ScriptedOCRBackend, ScriptedReasoningBackend
from handwritten_ocr_tpu.engine.prefetch import PrimedOCRBackend
from handwritten_ocr_tpu.engine.protocols import PreparedImage
from handwritten_ocr_tpu.graph import OCRPipeline
from handwritten_ocr_tpu.state import initial_state


class CountingPreprocessor:
    def __init__(self):
        self.calls = []

    def apply(self, image_path, strategy):
        label = "+".join(strategy) if not isinstance(strategy, str) else strategy
        self.calls.append((image_path, label))
        return PreparedImage(data=f"{image_path}:{label}",
                             strategy_label=label, source_path=image_path)


class BatchCountingOCR:
    def __init__(self, mapping):
        self.mapping = mapping
        self.batches = []

    def read_batch(self, images, prompt, max_new_tokens):
        self.batches.append(len(images))
        return [self.mapping[img.data] for img in images]

    def read(self, image, prompt, max_new_tokens):
        return self.read_batch([image], prompt, max_new_tokens)[0]

    def release(self):
        pass


def test_prime_batches_all_pages_initial_reads():
    mapping = {f"p{i}:{s}": f"text-{i}-{s}" for i in range(3)
               for s in ("a", "b", "c")}
    inner = BatchCountingOCR(mapping)
    primed = PrimedOCRBackend(inner)
    prep = CountingPreprocessor()

    primed.prime(prep, ["p0", "p1", "p2"], [["a"], ["b"], ["c"]],
                 "read", 64)
    assert inner.batches == [6]  # 3 pages x 2 initial strategies, ONE batch

    # Pipeline asks for the same reads → served from cache, no new batch.
    images = [prep.apply("p1", ["a"]), prep.apply("p1", ["b"])]
    texts = primed.read_batch(images, "read", 64)
    assert texts == ["text-1-a", "text-1-b"]
    assert inner.batches == [6]

    # A re-OCR read (strategy c) is a miss → delegated.
    miss = primed.read_batch([prep.apply("p1", ["c"])], "read", 64)
    assert miss == ["text-1-c"]
    assert inner.batches == [6, 1]


def test_cache_entries_are_single_use():
    inner = BatchCountingOCR({"p0:a": "first", "p0:b": "x"})
    primed = PrimedOCRBackend(inner)
    prep = CountingPreprocessor()
    primed.prime(prep, ["p0"], [["a"], ["b"]], "read", 64)
    img = prep.apply("p0", ["a"])
    assert primed.read_batch([img], "read", 64) == ["first"]
    # Second request re-reads through the inner backend (fresh, not stale).
    inner.mapping["p0:a"] = "second"
    assert primed.read_batch([img], "read", 64) == ["second"]


def test_full_pipeline_uses_primed_reads():
    cfg = RunConfig(strategies=[["a"], ["b"]])
    scripted = ScriptedOCRBackend(by_key={"a": "same text", "b": "same text"})

    class TrackingScripted(ScriptedOCRBackend):
        def __init__(self, **kw):
            super().__init__(**kw)
            self.batch_sizes = []

        def read_batch(self, images, prompt, max_new_tokens):
            self.batch_sizes.append(len(images))
            return super().read_batch(images, prompt, max_new_tokens)

    inner = TrackingScripted(by_key={"a": "same text", "b": "same text"})
    primed = PrimedOCRBackend(inner)
    prep = CountingPreprocessor()
    primed.prime(prep, ["/img.png"], cfg.strategies, "read", 64)
    assert inner.batch_sizes == [2]

    llm = ScriptedReasoningBackend([{
        "overall_confidence": 95, "verdict": "accept", "segments": [],
        "reasoning": "ok"}])
    pipe = OCRPipeline(primed, llm, preprocessor=prep, quiet=True)
    final = pipe.run(initial_state("/img.png", config=cfg.as_state_dict(),
                                   max_iterations=3))
    assert final["reason"] == "accept"
    assert final["current_best"] == "same text"
    # No extra OCR batches beyond the primed one.
    assert inner.batch_sizes == [2]
