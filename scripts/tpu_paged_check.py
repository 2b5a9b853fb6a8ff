#!/usr/bin/env python3
"""TPU-only parity check for the paged-attention decode kernel.

Two layers of evidence:
1. **Direct numeric bound** (the gate): kernel attention output vs a
   straight fp32 gather+softmax reference over random pools/tables/
   mixed lengths — max |diff| must stay within bf16 accumulation noise
   (< 0.02 on O(1)-scale outputs). This catches any indexing bug: a
   wrong page read produces O(1) errors, not O(1e-3).
2. **End-to-end token agreement** (informational): kernel-path decode vs
   the portable gather path on a random-weight model. Exact equality is
   NOT expected — the kernel's online softmax reassociates the
   accumulation (same class as our flash-attention prefill), and a
   random-weight model's greedy logits sit in near-ties, so occasional
   argmax flips occur; trained checkpoints have real margins.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def run(dtype_name: str, block_size: int = 16) -> list[list[int]]:
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.engine.serving import (
        ContinuousBatcher, GenRequest, PagedProgram)
    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    cfg = Qwen3Config(vocab_size=2048, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=4,
                      num_attention_heads=8, num_key_value_heads=4,
                      head_dim=128, eos_token_id=0, pad_token_id=0)
    params = init_qwen3(jax.random.PRNGKey(21), cfg, dtype=dtype)
    batcher = ContinuousBatcher(
        PagedProgram(params, cfg), n_slots=4, block_size=block_size,
        max_context=256, chunk=8, prefill_bucket=32, dtype=dtype)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 2000, size=n).tolist() for n in (6, 17, 29, 11, 23)]
    requests = [GenRequest(np.asarray(p, np.int32), 24) for p in prompts]
    return batcher.run(requests)


def compare(dtype_name: str) -> int:
    os.environ.pop("HOCR_TPU_PAGED", None)
    kernel_tokens = run(dtype_name)
    os.environ["HOCR_TPU_PAGED"] = "0"
    gather_tokens = run(dtype_name)
    os.environ.pop("HOCR_TPU_PAGED", None)
    matches = sum(a == b for a, b in zip(kernel_tokens, gather_tokens))
    print(f"[{dtype_name}] paged kernel parity: "
          f"{matches}/{len(kernel_tokens)} rows identical")
    for row, (a, b) in enumerate(zip(kernel_tokens, gather_tokens)):
        if a != b:
            agree = sum(x == y for x, y in zip(a, b)) / max(len(a), 1)
            print(f"  [{dtype_name}] row {row}: token agreement {agree:.2f}")
    return matches


def direct_numeric_bound() -> float:
    """Kernel output vs fp32 gather+softmax reference; returns max |diff|."""
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.paged_attention. \
        paged_attention_kernel import paged_attention

    rng = np.random.default_rng(0)
    h, n, bs, d, s, mb, hq = 4, 33, 16, 128, 5, 8, 8
    k_pool = jnp.asarray(rng.standard_normal((h, n, bs, d)), jnp.bfloat16)
    v_pool = jnp.asarray(rng.standard_normal((h, n, bs, d)), jnp.bfloat16)
    tables = jnp.asarray(rng.integers(1, n, (s, mb)), jnp.int32)
    lengths = jnp.asarray([7, 30, 64, 100, 128], jnp.int32)
    q = jnp.asarray(rng.standard_normal((s, hq, d)), jnp.bfloat16)
    scale = d ** -0.5
    got = np.asarray(paged_attention(
        (q * scale).astype(jnp.bfloat16), k_pool, v_pool, lengths=lengths,
        page_indices=tables, pages_per_compute_block=4), np.float32)

    k_np = np.asarray(k_pool, np.float32)
    v_np = np.asarray(v_pool, np.float32)
    t_np, l_np, q_np = (np.asarray(tables), np.asarray(lengths),
                        np.asarray(q, np.float32))
    worst = 0.0
    group = hq // h
    for row in range(s):
        keys = k_np[:, t_np[row]].reshape(h, mb * bs, d)
        vals = v_np[:, t_np[row]].reshape(h, mb * bs, d)
        for head in range(hq):
            kv = head // group
            scores = keys[kv] @ q_np[row, head] * scale
            scores[np.arange(mb * bs) >= l_np[row]] = -1e30
            weights = np.exp(scores - scores.max())
            weights /= weights.sum()
            worst = max(worst, float(np.abs(
                weights @ vals[kv] - got[row, head]).max()))
    return worst


def main() -> None:
    bound = direct_numeric_bound()
    print(f"direct kernel-vs-fp32-reference max|diff|: {bound:.5f}")
    assert bound < 0.02, f"kernel numeric bound blown: {bound} (indexing bug?)"
    compare("f32")
    compare("bf16")
    print("OK: kernel within bf16 accumulation noise of the fp32 reference")


if __name__ == "__main__":
    main()
