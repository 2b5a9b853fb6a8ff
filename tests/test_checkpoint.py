"""Native checkpoint save/restore round-trip (orbax)."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytest.importorskip("orbax.checkpoint")

from handwritten_ocr_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from handwritten_ocr_tpu.models.init import init_vl
from handwritten_ocr_tpu.models.quant import quantize_tree


def small_cfg():
    from handwritten_ocr_tpu.models.qwen25vl.config import (
        TextConfig, VisionConfig, VLConfig)
    return VLConfig(
        vision=VisionConfig(depth=1, hidden_size=32, intermediate_size=64,
                            num_heads=2, out_hidden_size=32,
                            fullatt_block_indexes=(0,)),
        text=TextConfig(vocab_size=256, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=1, num_attention_heads=2,
                        num_key_value_heads=1, mrope_section=(2, 3, 3)),
    )


def test_checkpoint_roundtrip(tmp_path):
    params = init_vl(jax.random.PRNGKey(0), small_cfg(), dtype=jnp.float32)
    meta = {"family": "vl", "hf_config": {"hidden_size": 32}, "dtype": "float32"}
    save_checkpoint(tmp_path / "ckpt", params, meta)

    restored, meta2 = load_checkpoint(tmp_path / "ckpt")
    assert meta2 == meta
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_quantized(tmp_path):
    params = quantize_tree(init_vl(jax.random.PRNGKey(1), small_cfg(),
                                   dtype=jnp.float32))
    save_checkpoint(tmp_path / "q8", params, {"family": "vl", "quantize": "int8",
                                              "hf_config": {}})
    restored, _ = load_checkpoint(tmp_path / "q8")
    leaf = restored["text"]["layers"]["attn"]["q"]
    assert leaf["w_q"].dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(leaf["w_q"]),
        np.asarray(params["text"]["layers"]["attn"]["q"]["w_q"]))


def test_convert_checkpoint_cli_end_to_end(tmp_path):
    """HF safetensors snapshot → native checkpoint → engine load."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM

    hf_cfg = HFQwen3Config(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, tie_word_embeddings=False)
    torch.manual_seed(3)
    hf = Qwen3ForCausalLM(hf_cfg)
    src = tmp_path / "snapshot"
    src.mkdir()
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()},
              str(src / "model.safetensors"))
    (src / "config.json").write_text(hf_cfg.to_json_string())

    import os
    import subprocess
    import sys as sys_mod
    dst = tmp_path / "native"
    result = subprocess.run(
        [sys_mod.executable, "scripts/convert_checkpoint.py", "qwen3",
         str(src), str(dst), "--quantize", "int8", "--dtype", "float32"],
        capture_output=True, text=True, cwd=str(Path(__file__).parent.parent),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert result.returncode == 0, result.stderr[-2000:]
    assert (dst / "meta.json").exists()

    from handwritten_ocr_tpu.models.checkpoint import load_checkpoint
    params, meta = load_checkpoint(dst)
    assert meta["family"] == "qwen3" and meta["quantize"] == "int8"
    assert params["layers"]["attn"]["q"]["w_q"].dtype == jnp.int8
    assert (dst / "config.json").exists()  # self-contained dir
