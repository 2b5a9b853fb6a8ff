"""HBM budget arithmetic: analytic byte counts vs materialized trees,
and the flagship 7B-VLM + 32B-LLM co-residency plan (SURVEY §7 hard part
5: two large models resident on a v5e-8 slice)."""

import jax
import jax.numpy as jnp

from handwritten_ocr_tpu.models.init import init_qwen3, init_vl
from handwritten_ocr_tpu.models.qwen25vl.config import (
    TextConfig,
    VisionConfig,
    VLConfig,
)
from handwritten_ocr_tpu.models.qwen3 import Qwen3Config
from handwritten_ocr_tpu.parallel.budget import (
    coresident_plan,
    kv_cache_bytes,
    qwen3_param_bytes,
    tree_bytes,
    vl_param_bytes,
)


def tiny_vl_cfg():
    return VLConfig(
        vision=VisionConfig(depth=2, hidden_size=64, intermediate_size=128,
                            num_heads=4, out_hidden_size=96,
                            fullatt_block_indexes=(1,)),
        text=TextConfig(vocab_size=1024, hidden_size=96,
                        intermediate_size=192, num_hidden_layers=2,
                        num_attention_heads=8, num_key_value_heads=4,
                        mrope_section=(2, 5, 5)),
    )


def tiny_qwen3_cfg():
    return Qwen3Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=3, num_attention_heads=8,
                       num_key_value_heads=4, head_dim=16)


def test_qwen3_bytes_match_tree():
    cfg = tiny_qwen3_cfg()
    for quant in (None, "int8"):
        params = init_qwen3(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                            quantize=quant)
        assert qwen3_param_bytes(cfg, quant) == tree_bytes(params)


def test_vl_bytes_match_tree():
    cfg = tiny_vl_cfg()
    for quant in (None, "int8"):
        params = init_vl(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                         quantize=quant)
        assert vl_param_bytes(cfg, quant) == tree_bytes(params)


def test_flagship_coresident_plan_fits_v5e8():
    """olmOCR-2-7B (int8, TP4) + Qwen3-32B (int8, TP8) + KV caches must fit
    a v5e-8 slice (16 GiB/chip) — this is the serving deployment."""
    vl = VLConfig()          # defaults = 7B dims
    llm = Qwen3Config()      # defaults = 32B dims
    assert qwen3_param_bytes(llm, "int8") > 30 * 2**30   # sanity: it IS 32B-class
    plan = coresident_plan(vl, llm)
    assert plan.fits, plan.report()
    # Neither engine alone fits a chip unsharded in int8+bf16-embeds —
    # co-residency genuinely requires the TP sharding.
    assert qwen3_param_bytes(llm, "int8") > plan.hbm_per_chip
    report = plan.report()
    assert "TP8" in report and "FITS" in report


def test_kv_cache_bytes():
    # 2 (k+v) * L2 * B3 * S8 * H4 * D16 * bf16
    assert kv_cache_bytes(2, 3, 8, 4, 16) == 2 * 2 * 3 * 8 * 4 * 16 * 2
