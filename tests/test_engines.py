"""End-to-end engine tests: tiny JAX VLM driving the full pipeline.

Runs the real TPU-native path — image file → device preprocessing chain →
pack → batched VLM prefill/decode → tokenizer → pipeline routing — with a
tiny random model and a byte-level test tokenizer (no checkpoints needed).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from PIL import Image

from handwritten_ocr_tpu.config import RunConfig
from handwritten_ocr_tpu.engine.fakes import ScriptedReasoningBackend
from handwritten_ocr_tpu.engine.jax_engines import (
    JaxOCRBackend,
    JaxReasoningBackend,
    TPUPreprocessor,
    build_jax_pipeline,
)
from handwritten_ocr_tpu.graph import OCRPipeline
from handwritten_ocr_tpu.models.processor import (
    IMAGE_PAD,
    IM_END,
    IM_START,
    VISION_END,
    VISION_START,
    llm_chat_prompt,
    vlm_chat_prompt,
)
from handwritten_ocr_tpu.state import initial_state

SPECIALS = {
    IM_START: 151644, IM_END: 151645,
    VISION_START: 151652, VISION_END: 151653, IMAGE_PAD: 151655,
    "<think>": 151667, "</think>": 151668,
}


class ByteTokenizer:
    """Chars → byte ids; ``<|...|>`` specials → real Qwen special ids."""

    def encode(self, text: str) -> list[int]:
        import re
        out: list[int] = []
        pos = 0
        pattern = re.compile("|".join(re.escape(s) for s in SPECIALS))
        for match in pattern.finditer(text):
            out.extend(min(ord(c), 255) for c in text[pos:match.start()])
            out.append(SPECIALS[match.group()])
            pos = match.end()
        out.extend(min(ord(c), 255) for c in text[pos:])
        return out

    def decode(self, ids) -> str:
        return "".join(chr(i) for i in ids if i < 256)


def tiny_vl_model():
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration
    from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig
    from handwritten_ocr_tpu.models.qwen25vl.model import VLModel
    from handwritten_ocr_tpu.models.weights import convert_vl

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=152064, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            window_size=112, fullatt_block_indexes=[1], out_hidden_size=32,
        ),
    )
    torch.manual_seed(7)
    hf = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    config = VLConfig.from_hf(cfg.to_dict())
    params = convert_vl(hf, config, dtype=jnp.float32)
    return VLModel(params, config)


@pytest.fixture(scope="module")
def ocr_backend():
    # Small pixel budget keeps grids tiny on the CPU test mesh.
    return JaxOCRBackend(tiny_vl_model(), ByteTokenizer(),
                         min_pixels=28 * 28, max_pixels=56 * 56)


@pytest.fixture()
def page(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(180, 256, (60, 80, 3), dtype=np.uint8)
    arr[25:32, 10:70] = 20  # a dark stroke
    path = tmp_path / "page.png"
    Image.fromarray(arr).save(path)
    return path


def test_read_batch_shapes_and_determinism(ocr_backend, page):
    prep = TPUPreprocessor()
    imgs = [prep.apply(str(page), ["high_contrast", "binarize"]),
            prep.apply(str(page), ["sharpen"])]
    texts = ocr_backend.read_batch(imgs, "Extract text.", max_new_tokens=6)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)
    again = ocr_backend.read_batch(imgs, "Extract text.", max_new_tokens=6)
    assert texts == again  # greedy decode is deterministic


def test_single_read_equals_batch_row(ocr_backend, page):
    prep = TPUPreprocessor()
    img = prep.apply(str(page), ["sharpen"])
    solo = ocr_backend.read(img, "Extract text.", 6)
    batch = ocr_backend.read_batch([img, img], "Extract text.", 6)
    assert batch == [solo, solo]


def test_full_pipeline_with_jax_ocr(ocr_backend, page):
    llm = ScriptedReasoningBackend([{
        "overall_confidence": 95, "verdict": "accept",
        "segments": [], "reasoning": "ok",
    }])
    cfg = RunConfig(strategies=[["high_contrast"], ["sharpen"]])
    pipe = OCRPipeline(ocr_backend, llm, preprocessor=TPUPreprocessor(),
                       quiet=True)
    state = initial_state(str(page), config={**cfg.as_state_dict(),
                                             "ocr_max_new_tokens": 6},
                          max_iterations=3)
    final = pipe.run(state)
    assert final["status"] == "completed"
    assert final["strategies_used"] == ["high_contrast", "sharpen"]
    assert len(final["candidates"]) == 2
    assert final["current_best"] == final["candidates"][0]["text"] or \
        isinstance(final["current_best"], str)


def test_jax_reasoning_backend_roundtrip():
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from handwritten_ocr_tpu.models.weights import convert_qwen3

    hf_cfg = HFQwen3Config(
        vocab_size=152064, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, tie_word_embeddings=False)
    torch.manual_seed(9)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    config = Qwen3Config.from_hf(hf_cfg.to_dict())
    model = Qwen3Model(convert_qwen3(hf, config, dtype=jnp.float32), config)
    backend = JaxReasoningBackend(model, ByteTokenizer())

    out = backend.chat("system prompt", "user message",
                       temperature=0.1, max_tokens=5)
    assert isinstance(out, str)
    # Non-thinking template includes the empty think block.
    assert "<think>" in llm_chat_prompt("s", "u")


def test_prompt_id_expansion(ocr_backend):
    ids = ocr_backend._prompt_ids("read this", n_image_tokens=5)
    image_id = ocr_backend.model.config.image_token_id
    assert (ids == image_id).sum() == 5
    # Image run is contiguous between vision start/end markers.
    positions = np.flatnonzero(ids == image_id)
    assert positions[-1] - positions[0] == 4


def test_build_jax_pipeline_missing_env(monkeypatch):
    monkeypatch.delenv("HOCR_OLMOCR_DIR", raising=False)
    monkeypatch.delenv("HOCR_QWEN3_DIR", raising=False)
    with pytest.raises(SystemExit, match="HOCR_OLMOCR_DIR"):
        build_jax_pipeline()


def test_pack_image_device_matches_host():
    """Device packing is numerically identical to the HF-order host pack."""
    from handwritten_ocr_tpu.models.processor import pack_image, pack_image_device
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (56, 84, 3), dtype=np.uint8)
    host = pack_image(img, do_resize=False)
    dev_patches, dev_grid = pack_image_device(jnp.asarray(img))
    assert dev_grid == host.grid
    np.testing.assert_allclose(np.asarray(dev_patches), host.patches,
                               rtol=1e-6, atol=1e-6)


def test_pack_image_device_grayscale_and_alignment():
    from handwritten_ocr_tpu.models.processor import pack_image_device
    img = jnp.zeros((56, 56), jnp.uint8)
    patches, grid = pack_image_device(img)
    assert grid == (1, 4, 4)
    assert patches.shape == (16, 3 * 2 * 14 * 14)
    with pytest.raises(ValueError, match="not 28-aligned"):
        pack_image_device(jnp.zeros((30, 56), jnp.uint8))


class DenseCharTokenizer:
    """Every id maps to a printable char (id % alphabet): no invisible
    tokens, so a random model's constrained decode must emit real JSON."""

    ALPHABET = '{}[]",:0123456789.eE+-truefalsnul abcdefgh'

    def encode(self, text: str) -> list[int]:
        return [self.ALPHABET.find(c) % len(self.ALPHABET) for c in text]

    def decode(self, ids) -> str:
        return "".join(self.ALPHABET[i % len(self.ALPHABET)] for i in ids)


def test_constrained_json_decode_emits_valid_json():
    """generate_json forces syntactically valid JSON from a random model."""
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from handwritten_ocr_tpu.models.weights import convert_qwen3
    from handwritten_ocr_tpu.utils.json_guard import is_viable_prefix

    hf_cfg = HFQwen3Config(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, tie_word_embeddings=False, eos_token_id=255)
    torch.manual_seed(11)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    config = Qwen3Config.from_hf(hf_cfg.to_dict())
    model = Qwen3Model(convert_qwen3(hf, config, dtype=jnp.float32), config)
    tok = DenseCharTokenizer()

    prompt = np.array([tok.encode("respond: ")], dtype=np.int32)
    out = model.generate_json(prompt, max_new_tokens=32, tokenizer=tok)
    # A random model free-decodes garbage; constrained, every emitted char
    # must keep the text a viable JSON prefix.
    assert out, "no constrained output produced"
    assert is_viable_prefix(out)
    # And the unconstrained decode of the same model is NOT valid JSON
    # (shows the constraint is doing the work).
    free = model.generate(prompt, 32)
    free_text = tok.decode(np.asarray(free.tokens)[0].tolist())
    assert not is_viable_prefix(free_text.strip() or "x")


def test_reasoning_backend_json_schema_path():
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from handwritten_ocr_tpu.models.weights import convert_qwen3

    hf_cfg = HFQwen3Config(
        vocab_size=152064, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, tie_word_embeddings=False)
    torch.manual_seed(12)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    config = Qwen3Config.from_hf(hf_cfg.to_dict())
    model = Qwen3Model(convert_qwen3(hf, config, dtype=jnp.float32), config)
    backend = JaxReasoningBackend(model, ByteTokenizer())

    out = backend.chat("critic system", "analyze this", temperature=0.1,
                       max_tokens=24, json_schema={"type": "object"})
    from handwritten_ocr_tpu.utils.json_guard import is_viable_prefix
    assert isinstance(out, str)
    if out:
        assert is_viable_prefix(out)
