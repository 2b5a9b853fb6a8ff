"""Numerical parity: JAX models vs HF transformers on tiny random configs.

Zero-egress environment → no real checkpoints; instead we instantiate tiny
randomly-initialized HF models (fp32, CPU), convert their weights through the
production converter, and require logits/greedy-decode agreement. This
validates architecture + converter; real checkpoints flow through the exact
same code path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig
from handwritten_ocr_tpu.models.qwen25vl.model import VLModel, rope_index_for_prompt
from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model
from handwritten_ocr_tpu.models.weights import convert_qwen3, convert_vl

IMAGE_TOKEN = 151655
VISION_START = 151652
VISION_END = 151653


def tiny_hf_vl():
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration
    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=152064, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            rope_theta=1000000.0, max_position_embeddings=4096,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            window_size=112, fullatt_block_indexes=[1], out_hidden_size=64,
            in_channels=3,
        ),
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg)
    model.eval()
    return model, cfg


@pytest.fixture(scope="module")
def vl_pair():
    hf_model, hf_cfg = tiny_hf_vl()
    config = VLConfig.from_hf(hf_cfg.to_dict())
    params = convert_vl(hf_model, config, dtype=jnp.float32)
    return hf_model, config, VLModel(params, config)


def make_vl_inputs(hf_cfg_vision, grid=(1, 4, 8), batch=1, seed=0):
    """Random patches + a prompt with the right number of image tokens."""
    t, h, w = grid
    merge = 2
    n_patches = t * h * w
    n_img_tokens = n_patches // (merge * merge)
    patch_dim = 3 * 2 * 14 * 14
    rng = np.random.default_rng(seed)
    patches = rng.standard_normal((batch, n_patches, patch_dim)).astype(np.float32)
    ids = ([10, 11, VISION_START] + [IMAGE_TOKEN] * n_img_tokens
           + [VISION_END, 12, 13, 14])
    input_ids = np.tile(np.array(ids, dtype=np.int64), (batch, 1))
    return patches, input_ids


def test_vl_logits_parity(vl_pair):
    hf_model, config, jax_model = vl_pair
    grid = (1, 4, 8)
    patches, input_ids = make_vl_inputs(None, grid=grid)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(patches[0]),
            image_grid_thw=torch.tensor([list(grid)]),
        )
    hf_logits = hf_out.logits.numpy()

    jax_logits = np.asarray(
        jax_model.forward_logits(input_ids, jnp.asarray(patches), grid))

    np.testing.assert_allclose(jax_logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_vl_text_only_logits_parity(vl_pair):
    hf_model, config, jax_model = vl_pair
    rng = np.random.default_rng(1)
    input_ids = rng.integers(0, 1000, size=(2, 9))
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.tensor(input_ids)).logits.numpy()
    jax_logits = np.asarray(jax_model.forward_logits(input_ids))
    np.testing.assert_allclose(jax_logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_vl_greedy_decode_parity(vl_pair):
    hf_model, config, jax_model = vl_pair
    grid = (1, 4, 8)
    patches, input_ids = make_vl_inputs(None, grid=grid)
    max_new = 8

    with torch.no_grad():
        hf_tokens = hf_model.generate(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(patches[0]),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=max_new, do_sample=False,
        )[0, input_ids.shape[1]:].numpy()

    result = jax_model.generate(input_ids, jnp.asarray(patches), grid, max_new)
    ours = np.asarray(result.tokens[0])[: len(hf_tokens)]
    np.testing.assert_array_equal(ours, hf_tokens)


def test_vl_batched_rows_identical(vl_pair):
    """Batched identical inputs must produce identical outputs per row."""
    _, config, jax_model = vl_pair
    grid = (1, 4, 8)
    patches, input_ids = make_vl_inputs(None, grid=grid, batch=3)
    # Same patches in every row:
    patches[1] = patches[0]
    patches[2] = patches[0]
    logits = np.asarray(jax_model.forward_logits(
        input_ids, jnp.asarray(patches), grid))
    np.testing.assert_allclose(logits[1], logits[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(logits[2], logits[0], rtol=1e-5, atol=1e-5)


def test_rope_index_matches_hf(vl_pair):
    hf_model, config, _ = vl_pair
    grid = (1, 4, 8)
    _, input_ids = make_vl_inputs(None, grid=grid)
    hf_pos, hf_delta = hf_model.model.get_rope_index(
        torch.tensor(input_ids), image_grid_thw=torch.tensor([list(grid)]))
    ours, delta = rope_index_for_prompt(input_ids[0], config, [grid])
    np.testing.assert_array_equal(ours, hf_pos[:, 0].numpy())
    assert delta == int(hf_delta[0, 0])


def test_rope_index_text_only(vl_pair):
    _, config, _ = vl_pair
    ids = np.arange(7)
    pos, delta = rope_index_for_prompt(ids, config, [])
    np.testing.assert_array_equal(pos, np.tile(np.arange(7), (3, 1)))
    assert delta == 0


# ── Qwen3 ───────────────────────────────────────────────────────────

def tiny_hf_qwen3():
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM
    cfg = HFQwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=1000000.0, max_position_embeddings=4096,
        tie_word_embeddings=False, eos_token_id=3,
    )
    torch.manual_seed(1)
    model = Qwen3ForCausalLM(cfg)
    model.eval()
    return model, cfg


@pytest.fixture(scope="module")
def qwen3_pair():
    hf_model, hf_cfg = tiny_hf_qwen3()
    config = Qwen3Config.from_hf(hf_cfg.to_dict())
    params = convert_qwen3(hf_model, config, dtype=jnp.float32)
    return hf_model, config, Qwen3Model(params, config)


def test_qwen3_logits_parity(qwen3_pair):
    hf_model, config, jax_model = qwen3_pair
    rng = np.random.default_rng(2)
    input_ids = rng.integers(4, 512, size=(2, 11))
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.tensor(input_ids)).logits.numpy()
    jax_logits = np.asarray(jax_model.forward_logits(input_ids))
    np.testing.assert_allclose(jax_logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_qwen3_greedy_decode_parity(qwen3_pair):
    hf_model, config, jax_model = qwen3_pair
    rng = np.random.default_rng(3)
    input_ids = rng.integers(4, 512, size=(1, 6))
    max_new = 10
    with torch.no_grad():
        hf_tokens = hf_model.generate(
            input_ids=torch.tensor(input_ids), max_new_tokens=max_new,
            do_sample=False, eos_token_id=3, pad_token_id=0,
        )[0, input_ids.shape[1]:].numpy()
    result = jax_model.generate(input_ids, max_new)
    ours = np.asarray(result.tokens[0])[: len(hf_tokens)]
    np.testing.assert_array_equal(ours, hf_tokens)


def test_qwen3_left_padded_batch_decode(qwen3_pair):
    """Left-padded batched prompts decode like their unpadded versions."""
    hf_model, config, jax_model = qwen3_pair
    rng = np.random.default_rng(4)
    short = rng.integers(4, 512, size=5)
    long = rng.integers(4, 512, size=8)
    pad = config.pad_token_id % 512
    batch_ids = np.stack([
        np.concatenate([[pad] * 3, short]),
        long,
    ])
    pad_mask = np.stack([
        np.array([False] * 3 + [True] * 5),
        np.ones(8, bool),
    ])
    batched = jax_model.generate(batch_ids, 6, pad_mask=pad_mask)
    solo = jax_model.generate(short[None], 6)
    np.testing.assert_array_equal(
        np.asarray(batched.tokens[0]), np.asarray(solo.tokens[0]))


def test_vl_logits_parity_large_windowed_grid(vl_pair):
    """Grid (1,12,16): multiple real vision windows + edge padding."""
    hf_model, config, jax_model = vl_pair
    grid = (1, 12, 16)
    patches, input_ids = make_vl_inputs(None, grid=grid, seed=5)
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(input_ids),
            pixel_values=torch.tensor(patches[0]),
            image_grid_thw=torch.tensor([list(grid)]),
        ).logits.numpy()
    jax_logits = np.asarray(
        jax_model.forward_logits(input_ids, jnp.asarray(patches), grid))
    np.testing.assert_allclose(jax_logits, hf_logits, rtol=3e-4, atol=3e-4)
