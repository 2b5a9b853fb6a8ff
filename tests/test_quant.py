"""Weight-only int8 quantization: structure, numerics, decode behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_ocr_tpu.models.init import init_vl
from handwritten_ocr_tpu.models.layers import linear
from handwritten_ocr_tpu.models.quant import (
    dequantize_weight,
    quantize_tree,
    quantized_bytes,
)


def small_cfg():
    from handwritten_ocr_tpu.models.qwen25vl.config import (
        TextConfig, VisionConfig, VLConfig)
    return VLConfig(
        vision=VisionConfig(depth=2, hidden_size=64, intermediate_size=128,
                            num_heads=4, out_hidden_size=64,
                            fullatt_block_indexes=(1,)),
        text=TextConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, mrope_section=(2, 3, 3)),
    )


def test_quantize_tree_structure_and_size():
    params = init_vl(jax.random.PRNGKey(0), small_cfg(), dtype=jnp.float32)
    before = quantized_bytes(params)
    quant = quantize_tree(params)
    after = quantized_bytes(quant)
    layer = quant["text"]["layers"]          # layer-stacked leaves
    assert layer["attn"]["q"]["w_q"].dtype == jnp.int8
    assert layer["attn"]["q"]["w_scale"].shape[1:] == (64,)
    assert "w" not in layer["attn"]["q"]
    assert layer["attn"]["q"]["b"].dtype == jnp.float32   # bias kept
    # lm_head quantized (largest per-step weight read); embed / norms not.
    assert quant["text"]["lm_head"]["w_q"].dtype == jnp.int8
    assert quant["text"]["embed"]["w"].dtype == jnp.float32
    assert after < before * 0.6
    # Opt-out keeps the head in full precision (pre-round-2 policy).
    kept = quantize_tree(params, lm_head=False)
    assert kept["text"]["lm_head"]["w"].dtype == jnp.float32
    assert kept["text"]["layers"]["attn"]["q"]["w_q"].dtype == jnp.int8


def test_quantized_linear_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32) * 0.1
    x = rng.standard_normal((4, 64)).astype(np.float32)
    params = {"w": jnp.asarray(w)}
    quant = quantize_tree({"gate": params})["gate"]
    exact = x @ w
    approx = np.asarray(linear(quant, jnp.asarray(x)))
    rel = np.abs(approx - exact).max() / np.abs(exact).max()
    assert rel < 0.02  # per-channel int8: <2% worst-case on gaussian weights
    # Dequantized weight round-trips within one quantization step.
    deq = np.asarray(dequantize_weight(quant, dtype=jnp.float32))
    step = np.abs(w).max(axis=0) / 127.0
    assert (np.abs(deq - w) <= step[None, :] + 1e-6).all()


def test_quantized_model_logits_close():
    cfg = small_cfg()
    params = init_vl(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    quant = quantize_tree(params)
    from handwritten_ocr_tpu.train.step import vl_forward
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 500, (1, 12),
                                                        dtype=np.int32))
    pos = jnp.asarray(np.tile(np.arange(12)[None, None], (3, 1, 1)))
    full = np.asarray(vl_forward(params, cfg, ids, None, None, pos))
    q8 = np.asarray(vl_forward(quant, cfg, ids, None, None, pos))
    # Logit drift stays small relative to the logit scale.
    denom = np.abs(full).max()
    assert np.abs(q8 - full).max() / denom < 0.1
    # Top-1 predictions overwhelmingly agree.
    agree = (full.argmax(-1) == q8.argmax(-1)).mean()
    assert agree >= 0.9


def test_int8_lm_head_argmax_agreement():
    """Greedy decisions through the int8 head track the bf16 head.

    Random-weight logits are near worst case (near-uniform, tight ties), so
    high agreement here is a conservative bound for trained checkpoints.
    """
    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config
    from handwritten_ocr_tpu.models.qwen25vl.language import lm_logits
    cfg = Qwen3Config(vocab_size=1024, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16)
    params = init_qwen3(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    quant = quantize_tree(params)
    hidden = jnp.asarray(np.random.default_rng(3).standard_normal(
        (16, 4, 64)).astype(np.float32))
    full = np.asarray(lm_logits(params, cfg, hidden))
    q8 = np.asarray(lm_logits(quant, cfg, hidden))
    assert q8.dtype == np.float32          # f32 accumulation + scaling
    drift = np.abs(q8 - full).max() / np.abs(full).max()
    assert drift < 0.05
    agree = (full.argmax(-1) == q8.argmax(-1)).mean()
    assert agree >= 0.9


def test_quantized_sharding_specs():
    from jax.sharding import PartitionSpec as P
    from handwritten_ocr_tpu.parallel.mesh import make_mesh
    from handwritten_ocr_tpu.parallel.sharding import param_shardings
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = quantize_tree(init_vl(jax.random.PRNGKey(0), small_cfg(),
                                   dtype=jnp.float32))
    mesh = make_mesh(8, model_parallel=4)
    shardings = param_shardings(mesh, params)
    attn = shardings["text"]["layers"]["attn"]
    assert attn["q"]["w_q"].spec == P(None, None, "model")
    assert attn["q"]["w_scale"].spec == P(None, "model")
    assert attn["o"]["w_q"].spec == P(None, "model", None)
    assert attn["o"]["w_scale"].spec == P(None, None)


def test_int8_matmul_kernel_parity_interpret():
    from handwritten_ocr_tpu.ops.int8_matmul import int8_matmul
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    w8 = jnp.asarray(rng.integers(-127, 128, (256, 512)).astype(np.int8))
    s = jnp.asarray((rng.random(512) * 0.02 + 0.001).astype(np.float32))
    expected = (np.asarray(x) @ np.asarray(w8).astype(np.float32)) * np.asarray(s)
    got = np.asarray(int8_matmul(x, w8, s, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_int8_matmul_padded_dims():
    """Non-block-aligned dims are zero-padded internally (e.g. 11008)."""
    from handwritten_ocr_tpu.ops.int8_matmul import (
        int8_matmul, int8_matmul_supported)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 300)).astype(np.float32))
    w8 = jnp.asarray(rng.integers(-127, 128, (300, 700)).astype(np.int8))
    s = jnp.asarray((rng.random(700) * 0.02 + 0.001).astype(np.float32))
    expected = (np.asarray(x) @ np.asarray(w8).astype(np.float32)) * np.asarray(s)
    got = np.asarray(int8_matmul(x, w8, s, interpret=True))
    assert got.shape == (2, 700)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)
    assert int8_matmul_supported(2048, 11008)
    assert not int8_matmul_supported(100, 512)


def test_quantized_linear_kernel_path_matches_fallback(monkeypatch):
    from handwritten_ocr_tpu.models.layers import linear
    rng = np.random.default_rng(6)
    w = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    quant = quantize_tree({"gate": {"w": jnp.asarray(w)}})["gate"]

    monkeypatch.setenv("HOCR_TPU_INT8", "interpret")
    kernel_out = np.asarray(linear(quant, x))
    monkeypatch.setenv("HOCR_TPU_INT8", "off")
    fallback_out = np.asarray(linear(quant, x))
    np.testing.assert_allclose(kernel_out, fallback_out, rtol=1e-5, atol=1e-5)


def test_int8_matmul_ragged_tail_blocks():
    """Ragged FINAL blocks (round 5): out-dims like the 8B head's
    151936 = 128 * 1187 (prime) have no usable block divisor; the
    kernel must handle a partial final out-block in place instead of
    padding the weight (the old pad path materialized a padded copy of
    the whole weight inside the decode program — ~2 ms/step at the
    real head). Covers tails below one 128-lane tile and the f32-out
    head mode."""
    from handwritten_ocr_tpu.ops.int8_matmul import int8_matmul
    rng = np.random.default_rng(17)
    for d_in, d_out, block_out in [
        (256, 1024 + 64, 1024),     # tail 64 < one lane tile
        (256, 1024 + 704, 1024),    # tail 704, multiple tiles
        (384, 128 * 7, 512),        # 896 = 512 + ragged 384
    ]:
        x = jnp.asarray(rng.standard_normal((3, d_in)).astype(np.float32))
        w8 = jnp.asarray(rng.integers(-127, 128, (d_in, d_out))
                         .astype(np.int8))
        s = jnp.asarray((rng.random(d_out) * 0.02 + 0.001)
                        .astype(np.float32))
        expected = (np.asarray(x) @ np.asarray(w8).astype(np.float32)) \
            * np.asarray(s)
        got = np.asarray(int8_matmul(x, w8, s, block_out=block_out,
                                     interpret=True))
        assert got.shape == (3, d_out)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)
        got_f32 = np.asarray(int8_matmul(x, w8, s, block_out=block_out,
                                         out_dtype=jnp.float32,
                                         interpret=True))
        assert got_f32.dtype == np.float32
        np.testing.assert_allclose(got_f32, expected, rtol=1e-5, atol=1e-4)
