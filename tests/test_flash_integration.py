"""Integration parity: model forwards with the flash kernel vs jnp path.

Forces the Pallas kernel through the interpreter on CPU via
HOCR_TPU_FLASH=interpret and checks end-to-end logits equivalence.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp


@pytest.fixture()
def flash_interpret(monkeypatch):
    monkeypatch.setenv("HOCR_TPU_FLASH", "interpret")


def test_vl_forward_flash_vs_reference(flash_interpret, monkeypatch):
    import sys
    sys.path.insert(0, "tests")
    from test_models_parity import make_vl_inputs, tiny_hf_vl
    from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig
    from handwritten_ocr_tpu.models.qwen25vl.model import VLModel
    from handwritten_ocr_tpu.models.weights import convert_vl

    hf_model, hf_cfg = tiny_hf_vl()
    config = VLConfig.from_hf(hf_cfg.to_dict())
    params = convert_vl(hf_model, config, dtype=jnp.float32)
    model = VLModel(params, config)

    grid = (1, 4, 8)
    patches, input_ids = make_vl_inputs(None, grid=grid)

    with_flash = np.asarray(model.forward_logits(
        input_ids, jnp.asarray(patches), grid))
    monkeypatch.setenv("HOCR_TPU_FLASH", "off")
    without = np.asarray(model.forward_logits(
        input_ids, jnp.asarray(patches), grid))
    np.testing.assert_allclose(with_flash, without, rtol=2e-5, atol=2e-5)


def test_generate_flash_prefill_matches(flash_interpret, monkeypatch):
    import sys
    sys.path.insert(0, "tests")
    from test_models_parity import tiny_hf_qwen3
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from handwritten_ocr_tpu.models.weights import convert_qwen3

    hf_model, hf_cfg = tiny_hf_qwen3()
    config = Qwen3Config.from_hf(hf_cfg.to_dict())
    model = Qwen3Model(convert_qwen3(hf_model, config, dtype=jnp.float32),
                       config)
    ids = np.random.default_rng(0).integers(4, 512, size=(2, 9))

    flash_result = model.generate(ids, 6)
    monkeypatch.setenv("HOCR_TPU_FLASH", "off")
    # Fresh model instance: jit caches trace per (self, args) and the env
    # flag is read at trace time.
    model2 = Qwen3Model(convert_qwen3(hf_model, config, dtype=jnp.float32),
                        config)
    plain_result = model2.generate(ids, 6)
    np.testing.assert_array_equal(np.asarray(flash_result.tokens),
                                  np.asarray(plain_result.tokens))
