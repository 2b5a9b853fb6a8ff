"""Multi-chip tests on the 8-device virtual CPU mesh.

Validates mesh construction, TP/FSDP sharding specs, numerical equivalence
of sharded vs replicated execution (GSPMD inserts correct collectives), and
the full sharded training step via the driver entry points.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from handwritten_ocr_tpu.models.init import init_vl
from handwritten_ocr_tpu.parallel.mesh import make_mesh, mesh_shape_for
from handwritten_ocr_tpu.parallel.sharding import (
    data_sharding,
    param_shardings,
    shard_params,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def small_cfg():
    from handwritten_ocr_tpu.models.qwen25vl.config import (
        TextConfig, VisionConfig, VLConfig)
    return VLConfig(
        vision=VisionConfig(depth=2, hidden_size=64, intermediate_size=128,
                            num_heads=8, out_hidden_size=64,
                            fullatt_block_indexes=(1,)),
        text=TextConfig(vocab_size=1024, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=8, num_key_value_heads=4,
                        mrope_section=(2, 3, 3)),
    )


def test_mesh_shapes():
    assert mesh_shape_for(8) == (8, 1)
    assert mesh_shape_for(8, model_parallel=4) == (2, 4)
    with pytest.raises(ValueError):
        mesh_shape_for(8, model_parallel=3)
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_param_sharding_specs():
    cfg = small_cfg()
    params = init_vl(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(8, model_parallel=4)
    shardings = param_shardings(mesh, params)

    text = shardings["text"]
    # Layer-stacked leaves carry a leading replicated [L] dim.
    assert text["layers"]["attn"]["q"]["w"].spec == P(None, None, "model")
    assert text["layers"]["attn"]["o"]["w"].spec == P(None, "model", None)
    assert text["layers"]["mlp"]["gate"]["w"].spec == P(None, None, "model")
    assert text["layers"]["mlp"]["down"]["w"].spec == P(None, "model", None)
    assert text["embed"]["w"].spec == P("model", None)
    assert text["lm_head"]["w"].spec == P(None, "model")
    assert text["final_norm"]["scale"].spec == P(None)
    vis = shardings["vision"]
    assert vis["blocks"]["attn"]["qkv"]["w"].spec == P(None, None, "model")
    assert vis["blocks"]["attn"]["proj"]["w"].spec == P(None, "model", None)


def test_fsdp_adds_data_axis():
    cfg = small_cfg()
    params = init_vl(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(8, model_parallel=4)
    shardings = param_shardings(mesh, params, fsdp=True)
    spec = shardings["text"]["layers"]["attn"]["q"]["w"].spec
    assert "model" in spec and "data" in spec


def test_tp_forward_matches_replicated():
    """TP-sharded forward must equal single-device execution."""
    from handwritten_ocr_tpu.train.step import vl_forward

    cfg = small_cfg()
    grid = (1, 4, 4)
    params = init_vl(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    n_img = 4
    ids = np.array([[1, 2, 151655] + [151655] * (n_img - 1) + [3, 4, 5]])
    ids = np.tile(ids, (2, 1)).astype(np.int32)
    # note: rope positions: plain arange is fine for an equivalence test
    pos = np.tile(np.arange(ids.shape[1])[None, None], (3, 2, 1)).astype(np.int32)
    patch_dim = 3 * 2 * 14 * 14
    patches = np.random.default_rng(0).standard_normal(
        (2, 16, patch_dim)).astype(np.float32)

    expected = np.asarray(vl_forward(params, cfg, jnp.asarray(ids),
                                     jnp.asarray(patches), grid,
                                     jnp.asarray(pos)))

    mesh = make_mesh(8, model_parallel=4)
    with mesh:
        sharded = shard_params(mesh, params)
        ids_s = jax.device_put(jnp.asarray(ids), data_sharding(mesh, 2))
        patches_s = jax.device_put(jnp.asarray(patches), data_sharding(mesh, 3))
        pos_s = jax.device_put(jnp.asarray(pos),
                               data_sharding(mesh, 3, batch_axis=1))
        fn = jax.jit(lambda p, i, x, q: vl_forward(p, cfg, i, x, grid, q))
        got = np.asarray(fn(sharded, ids_s, patches_s, pos_s))

    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as graft
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 3 and np.isfinite(np.asarray(out[..., :4])).all()


def test_sharded_ocr_backend_matches_unsharded(tmp_path):
    """Multi-chip OCR engine (TP + page DP) produces identical reads."""
    import sys
    sys.path.insert(0, "tests")
    from PIL import Image as PILImage
    from test_engines import ByteTokenizer, tiny_vl_model
    from handwritten_ocr_tpu.engine.jax_engines import JaxOCRBackend, TPUPreprocessor

    rng = np.random.default_rng(0)
    arr = rng.integers(120, 256, (60, 80, 3), dtype=np.uint8)
    path = tmp_path / "p.png"
    PILImage.fromarray(arr).save(path)
    prep = TPUPreprocessor(min_pixels=28 * 28, max_pixels=56 * 56)
    imgs = [prep.apply(str(path), ["sharpen"]),
            prep.apply(str(path), ["high_contrast"])]

    plain = JaxOCRBackend(tiny_vl_model(), ByteTokenizer(),
                          min_pixels=28 * 28, max_pixels=56 * 56)
    expected = plain.read_batch(imgs, "Extract.", 5)

    mesh = make_mesh(8, model_parallel=2)
    sharded = JaxOCRBackend(tiny_vl_model(), ByteTokenizer(),
                            min_pixels=28 * 28, max_pixels=56 * 56).shard(mesh)
    got = sharded.read_batch(imgs, "Extract.", 5)
    assert got == expected


def test_tp_qwen3_decode_matches_replicated():
    """TP-sharded reasoning decode (the 32B serving path) == replicated.

    The flagship qwen3:32b (ref config.py:8) must shard TP>=4 to fit
    v5e-class HBM; this validates the sharded greedy decode bit-matches
    single-device execution at tiny scale on the virtual mesh.
    """
    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=4, head_dim=16, eos_token_id=0)
    params = init_qwen3(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    ids = np.arange(1, 13, dtype=np.int32)[None].repeat(2, axis=0)
    expected = Qwen3Model(params, cfg).generate(ids, 8)
    expected_tokens = np.asarray(expected.tokens)

    mesh = make_mesh(8, model_parallel=4)
    with mesh:
        sharded = shard_params(mesh, params)
        got = Qwen3Model(sharded, cfg).generate(ids, 8)
        got_tokens = np.asarray(got.tokens)

    np.testing.assert_array_equal(got_tokens, expected_tokens)
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(expected.lengths))


def test_sharded_reasoning_backend_chat_batch():
    """JaxReasoningBackend.shard: batched chat runs TP-sharded and matches."""
    import sys
    sys.path.insert(0, "tests")
    from test_engines import ByteTokenizer
    from handwritten_ocr_tpu.engine.jax_engines import JaxReasoningBackend
    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=4, head_dim=16, eos_token_id=0)
    params = init_qwen3(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)

    class Req:
        def __init__(self, system, user):
            self.system, self.user = system, user

    reqs = [Req("sys", "check this text"), Req("sys", "another page entirely")]
    plain = JaxReasoningBackend(Qwen3Model(params, cfg), ByteTokenizer())
    expected = plain.chat_batch(reqs, temperature=0.1, max_tokens=6)

    mesh = make_mesh(8, model_parallel=4)
    sharded = JaxReasoningBackend(Qwen3Model(params, cfg),
                                  ByteTokenizer()).shard(mesh)
    assert sharded.chat_batch(reqs, temperature=0.1, max_tokens=6) == expected
