"""Lockstep multi-page driver: per-page semantics identical to the
sequential pipeline, with batched model calls."""

import json

import numpy as np
import pytest

from handwritten_ocr_tpu.config import RunConfig
from handwritten_ocr_tpu.engine.fakes import ScriptedOCRBackend
from handwritten_ocr_tpu.graph import OCRPipeline
from handwritten_ocr_tpu.graph.batch_driver import LockstepPipeline
from handwritten_ocr_tpu.state import initial_state


class ContentKeyedLLM:
    """Answers critic/editor/arbitrator calls based on prompt content —
    order-independent, so sequential and lockstep schedules get identical
    responses for each page."""

    def __init__(self, script: dict):
        # script: marker -> list of responses, consumed in order per marker.
        self.script = {k: list(v) for k, v in script.items()}
        self.calls = []

    def chat(self, system, user, *, temperature, max_tokens, json_schema=None):
        self.calls.append(user)
        for marker, responses in self.script.items():
            if marker in user and responses:
                return json.dumps(responses.pop(0))
        raise AssertionError(f"no scripted response matches: {user[:120]}")


class PageKeyedOCR:
    """OCR fake keyed by (source image, strategy)."""

    def __init__(self, mapping):
        self.mapping = mapping
        self.batch_sizes = []

    def read_batch(self, images, prompt, max_new_tokens):
        self.batch_sizes.append(len(images))
        return [self.mapping[(getattr(img, "source_path", img),
                              img.strategy_label)] for img in images]

    def read(self, image, prompt, max_new_tokens):
        return self.read_batch([image], prompt, max_new_tokens)[0]

    def release(self):
        pass


def critic(conf, verdict="needs_editing"):
    return {"overall_confidence": conf, "segments": [], "verdict": verdict,
            "reasoning": "r"}


def make_fixture():
    cfg = RunConfig(strategies=[["a"], ["b"], ["c"]])
    ocr_map = {
        ("/p0.png", "a"): "page zero words here", ("/p0.png", "b"): "page zero words here",
        ("/p1.png", "a"): "page one totally different text",
        ("/p1.png", "b"): "page one totally different text",
        ("/p1.png", "c"): "page one arbitrated read",
        ("/p2.png", "a"): "page two text", ("/p2.png", "b"): "page two text",
    }
    # Page 0: accept immediately. Page 1: needs_reocr then accept.
    # Page 2: edit once then accept.
    script = {
        "page zero words here": [critic(95, "accept")],
        "page one totally different text": [critic(40, "needs_reocr")],
        "Current best vs": [],  # placeholder (arbitrator matched below)
        "## Version 1": [{"final_text": "page one merged", "decisions": [],
                          "confidence": 80, "uncertain_segments": []}],
        "page one merged": [critic(90, "accept")],
        "page two text": [critic(50, "needs_editing")],
        "Critic's Findings": [{"corrected_text": "page two fixed",
                               "changes": [], "unresolved": []}],
        "page two fixed": [critic(92, "accept")],
    }
    states = [initial_state(f"/p{i}.png", config=cfg.as_state_dict(),
                            max_iterations=6) for i in range(3)]
    return cfg, ocr_map, script, states


ESSENTIAL = ("status", "reason", "iteration", "current_best",
             "strategies_used", "plateau_count", "current_score")


def final_essentials(state):
    base = {k: state[k] for k in ESSENTIAL}
    base["candidates"] = [c["text"] for c in state["candidates"]]
    base["actions"] = [e["action"] for e in state["trace_events"]]
    return base


def test_lockstep_matches_sequential():
    cfg, ocr_map, script, states = make_fixture()

    seq_finals = []
    for s in [initial_state(f"/p{i}.png", config=cfg.as_state_dict(),
                            max_iterations=6) for i in range(3)]:
        pipe = OCRPipeline(PageKeyedOCR(dict(ocr_map)),
                           ContentKeyedLLM(json.loads(json.dumps(script))),
                           quiet=True)
        seq_finals.append(pipe.run(s))

    lock = LockstepPipeline(PageKeyedOCR(dict(ocr_map)),
                            ContentKeyedLLM(json.loads(json.dumps(script))),
                            quiet=True)
    lock_finals = lock.run_many(states)

    for seq, locked in zip(seq_finals, lock_finals):
        assert final_essentials(seq) == final_essentials(locked)

    assert [s["reason"] for s in lock_finals] == ["accept", "accept", "accept"]
    assert lock_finals[1]["current_best"] == "page one merged"
    assert lock_finals[2]["current_best"] == "page two fixed"


def test_lockstep_batches_initial_reads():
    cfg, ocr_map, script, states = make_fixture()
    ocr = PageKeyedOCR(dict(ocr_map))
    lock = LockstepPipeline(ocr, ContentKeyedLLM(script), quiet=True)
    lock.run_many(states)
    # 3 pages x 2 initial strategies in ONE batch; page 1's re-OCR separate.
    assert ocr.batch_sizes[0] == 6
    assert sum(ocr.batch_sizes) == 7


def test_lockstep_exhaustion_and_plateau():
    cfg = RunConfig(strategies=[["a"], ["b"]])
    ocr_map = {("/x.png", "a"): "xx yy", ("/x.png", "b"): "xx yy",
               ("/y.png", "a"): "zz ww", ("/y.png", "b"): "zz ww"}
    script = {
        # NOTE: dict order is match precedence — editor prompts contain the
        # transcription too, so the editor marker must come first.
        "Critic's Findings": [
            {"corrected_text": "zz ww", "changes": [], "unresolved": []},
            {"corrected_text": "zz ww", "changes": [], "unresolved": []},
        ],
        # Page x: reocr → exhausted (only 2 strategies, both used).
        "xx yy": [critic(40, "needs_reocr")],
        # Page y: three non-improving critiques → plateau.
        "zz ww": [critic(50), critic(50), critic(50)],
    }
    states = [initial_state("/x.png", config=cfg.as_state_dict(), max_iterations=9),
              initial_state("/y.png", config=cfg.as_state_dict(), max_iterations=9)]
    lock = LockstepPipeline(PageKeyedOCR(ocr_map), ContentKeyedLLM(script),
                            quiet=True)
    finals = lock.run_many(states)
    assert finals[0]["reason"] == "exhausted"
    assert finals[0]["status"] == "completed"
    assert finals[1]["reason"] == "plateau"


def test_jax_chat_batch_matches_single():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, "tests")
    from test_engines import ByteTokenizer
    from handwritten_ocr_tpu.agents.runners import AgentRequest
    from handwritten_ocr_tpu.engine.jax_engines import JaxReasoningBackend
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from handwritten_ocr_tpu.models.weights import convert_qwen3

    hf_cfg = HFQwen3Config(vocab_size=152064, hidden_size=32,
                           intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=8, tie_word_embeddings=False)
    torch.manual_seed(21)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    config = Qwen3Config.from_hf(hf_cfg.to_dict())
    backend = JaxReasoningBackend(
        Qwen3Model(convert_qwen3(hf, config, dtype=jnp.float32), config),
        ByteTokenizer())

    reqs = [AgentRequest("sys", "short", {}),
            AgentRequest("sys", "a much longer user message", {})]
    batch = backend.chat_batch(reqs, temperature=0.1, max_tokens=6)
    singles = [backend.chat(r.system, r.user, temperature=0.1, max_tokens=6)
               for r in reqs]
    assert batch == singles


class PromptRecordingOCR(PageKeyedOCR):
    """PageKeyedOCR that also records the (prompt, max_new) of each batch."""

    def __init__(self, mapping):
        super().__init__(mapping)
        self.batch_params = []

    def read_batch(self, images, prompt, max_new_tokens):
        self.batch_params.append(
            (prompt, max_new_tokens, len(images)))
        return super().read_batch(images, prompt, max_new_tokens)


def test_lockstep_honors_per_page_config():
    """Two pages with different ocr_prompt/ocr_max_new_tokens: each page's
    reads must use its OWN config (not page 0's)."""
    base = RunConfig(strategies=[["a"], ["b"]])
    cfg_a = dict(base.as_state_dict(), ocr_prompt="PROMPT-A",
                 ocr_max_new_tokens=111)
    cfg_b = dict(base.as_state_dict(), ocr_prompt="PROMPT-B",
                 ocr_max_new_tokens=222)
    ocr_map = {("/pa.png", "a"): "alpha words", ("/pa.png", "b"): "alpha words",
               ("/pb.png", "a"): "beta words", ("/pb.png", "b"): "beta words"}
    script = {
        "alpha words": [critic(95, "accept")],
        "beta words": [critic(95, "accept")],
    }
    states = [initial_state("/pa.png", config=cfg_a, max_iterations=4),
              initial_state("/pb.png", config=cfg_b, max_iterations=4)]
    ocr = PromptRecordingOCR(ocr_map)
    lock = LockstepPipeline(ocr, ContentKeyedLLM(script), quiet=True)
    finals = lock.run_many(states)
    assert [s["reason"] for s in finals] == ["accept", "accept"]
    # Each config group ran as its own batch with its own prompt/budget.
    assert sorted(ocr.batch_params) == [
        ("PROMPT-A", 111, 2), ("PROMPT-B", 222, 2)]
