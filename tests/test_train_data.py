"""Fine-tuning data pipeline + training loop smoke test."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from PIL import Image

from handwritten_ocr_tpu.train.data import (
    Example,
    batches_by_grid,
    build_batch,
    discover_examples,
)
from handwritten_ocr_tpu.train.step import make_train_step


import sys
sys.path.insert(0, "tests")
from test_engines import ByteTokenizer  # noqa: E402


def small_cfg():
    from handwritten_ocr_tpu.models.qwen25vl.config import (
        TextConfig, VisionConfig, VLConfig)
    return VLConfig(
        vision=VisionConfig(depth=1, hidden_size=32, intermediate_size=64,
                            num_heads=2, out_hidden_size=32,
                            fullatt_block_indexes=(0,)),
        text=TextConfig(vocab_size=152064, hidden_size=32,
                        intermediate_size=64, num_hidden_layers=1,
                        num_attention_heads=2, num_key_value_heads=1,
                        mrope_section=(2, 3, 3)),
    )


@pytest.fixture()
def dataset(tmp_path):
    rng = np.random.default_rng(0)
    for stem, text in (("a", "first page"), ("b", "second page words")):
        arr = rng.integers(100, 256, (60, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{stem}.png")
        (tmp_path / f"{stem}.md").write_text(f"## Ground Truth\n{text}\n")
    # An image without GT must be skipped.
    Image.fromarray(np.zeros((60, 80, 3), np.uint8)).save(tmp_path / "no_gt.png")
    return tmp_path


def test_discover_examples(dataset):
    examples = discover_examples(dataset)
    assert [e.target_text for e in examples] == ["first page",
                                                 "second page words"]


def test_build_batch_masks_and_positions(dataset):
    cfg = small_cfg()
    examples = discover_examples(dataset)
    batch, grid = build_batch(examples, ByteTokenizer(), cfg,
                              min_pixels=28 * 28, max_pixels=56 * 56)
    batch_size, seq = batch.input_ids.shape
    assert batch_size == 2
    assert batch.position_ids.shape == (3, 2, seq)
    ids = np.asarray(batch.input_ids)
    mask = np.asarray(batch.loss_mask)
    # Loss only on target tokens; every row ends its loss span with eos.
    for row in range(2):
        span = np.flatnonzero(mask[row])
        assert len(span) > 0
        assert (ids[row, span] != cfg.image_token_id).all()
        assert ids[row, span[-1]] == cfg.eos_token_id
    # Image tokens present and unmasked.
    assert (ids == cfg.image_token_id).sum() > 0


def test_train_step_runs_and_improves(dataset):
    from handwritten_ocr_tpu.models.init import init_vl

    cfg = small_cfg()
    examples = discover_examples(dataset)
    batches = list(batches_by_grid(examples, ByteTokenizer(), cfg,
                                   batch_size=2,
                                   min_pixels=28 * 28, max_pixels=56 * 56))
    assert len(batches) == 1
    batch, grid = batches[0]

    params = init_vl(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    import optax
    opt_init, train_step = make_train_step(cfg, grid,
                                           optimizer=optax.adamw(3e-3))
    opt_state = opt_init(params)
    first_loss = None
    loss = None
    for _ in range(5):
        params, opt_state, loss = train_step(params, opt_state, batch)
        if first_loss is None:
            first_loss = float(loss)
    assert np.isfinite(first_loss)
    assert float(loss) < first_loss  # overfits the tiny batch


def test_train_step_through_pallas_kernels(dataset, monkeypatch):
    """Round-3 bench regression: on TPU the train step differentiates
    through the Pallas flash + window kernels, which have no autodiff
    rules without the custom VJPs. Forcing interpret mode reproduces
    that exact path on CPU: one step must run and produce a finite
    loss through a window layer AND a full-attention layer."""
    from handwritten_ocr_tpu.models.init import init_vl
    from handwritten_ocr_tpu.models.qwen25vl.config import (
        TextConfig, VisionConfig, VLConfig)

    monkeypatch.setenv("HOCR_TPU_FLASH", "interpret")
    monkeypatch.setenv("HOCR_TPU_WINATTN", "interpret")

    cfg = VLConfig(
        vision=VisionConfig(depth=2, hidden_size=32, intermediate_size=64,
                            num_heads=2, out_hidden_size=32,
                            fullatt_block_indexes=(1,)),
        text=TextConfig(vocab_size=152064, hidden_size=32,
                        intermediate_size=64, num_hidden_layers=1,
                        num_attention_heads=2, num_key_value_heads=1,
                        mrope_section=(2, 3, 3)),
    )
    examples = discover_examples(dataset)
    batch, grid = build_batch(examples, ByteTokenizer(), cfg,
                              min_pixels=28 * 28, max_pixels=56 * 56)
    params = init_vl(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    from handwritten_ocr_tpu.train.step import next_token_loss
    grad_fn = jax.value_and_grad(next_token_loss)
    loss_k, grads_k = grad_fn(params, cfg, batch, grid)

    monkeypatch.setenv("HOCR_TPU_FLASH", "0")
    monkeypatch.setenv("HOCR_TPU_WINATTN", "0")
    loss_r, grads_r = grad_fn(params, cfg, batch, grid)

    assert np.isfinite(float(loss_k))
    np.testing.assert_allclose(float(loss_k), float(loss_r), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        grads_k, grads_r)
