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


def direct_numeric_bound(t: int = 1) -> float:
    """Fused append+attention kernel (compiled) vs an fp32 append +
    gather+softmax reference; returns max |diff| over valid outputs.
    Also asserts the in-kernel appends landed bit-exactly."""
    import jax
    import jax.numpy as jnp
    from handwritten_ocr_tpu.ops.paged_decode_attention import (
        paged_append_attention)

    rng = np.random.default_rng(0)
    layers, n, bs, d, s, mb, hkv, hq = 2, 41, 16, 128, 5, 8, 4, 8
    layer = 1
    k_pool = rng.standard_normal((layers, n, bs, hkv, d)).astype(np.float32)
    v_pool = rng.standard_normal((layers, n, bs, hkv, d)).astype(np.float32)
    blocks = rng.permutation(np.arange(1, n))[: s * mb].reshape(s, mb)
    tables = blocks.astype(np.int32)
    start = np.asarray([6, 29, 63, 99, 127], np.int32)
    n_valid = np.asarray([t, t, max(t - 1, 0), t, 0], np.int32)
    q = rng.standard_normal((s, t, hq, d)).astype(np.float32)
    k_new = rng.standard_normal((s, t, hkv, d)).astype(np.float32)
    v_new = rng.standard_normal((s, t, hkv, d)).astype(np.float32)
    scale = d ** -0.5

    got, k2, v2 = paged_append_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k_new, jnp.bfloat16),
        jnp.asarray(v_new, jnp.bfloat16),
        jnp.asarray(k_pool, jnp.bfloat16), jnp.asarray(v_pool, jnp.bfloat16),
        jnp.asarray(tables), jnp.asarray(start), jnp.asarray(n_valid),
        layer=layer, scale=scale)
    got = np.asarray(got, np.float32)
    k2, v2 = np.asarray(k2, np.float32), np.asarray(v2, np.float32)

    kp = np.asarray(jnp.asarray(k_pool, jnp.bfloat16), np.float32).copy()
    vp = np.asarray(jnp.asarray(v_pool, jnp.bfloat16), np.float32).copy()
    kn = np.asarray(jnp.asarray(k_new, jnp.bfloat16), np.float32)
    vn = np.asarray(jnp.asarray(v_new, jnp.bfloat16), np.float32)
    qn = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
    for row in range(s):
        for i in range(int(n_valid[row])):
            pos = int(start[row]) + i
            kp[layer, tables[row, pos // bs], pos % bs] = kn[row, i]
            vp[layer, tables[row, pos // bs], pos % bs] = vn[row, i]
    assert np.array_equal(k2, kp) and np.array_equal(v2, vp), \
        "in-kernel append diverged from reference scatter"

    worst = 0.0
    group = hq // hkv
    for row in range(s):
        keys = kp[layer][tables[row]].reshape(mb * bs, hkv, d)
        vals = vp[layer][tables[row]].reshape(mb * bs, hkv, d)
        for tok in range(int(n_valid[row])):
            for head in range(hq):
                kv = head // group
                scores = keys[:, kv] @ qn[row, tok, head] * scale
                scores[np.arange(mb * bs) > int(start[row]) + tok] = -1e30
                weights = np.exp(scores - scores.max())
                weights /= weights.sum()
                worst = max(worst, float(np.abs(
                    weights @ vals[:, kv] - got[row, tok, head]).max()))
    return worst


def main() -> None:
    for t in (1, 9):
        bound = direct_numeric_bound(t)
        print(f"direct kernel-vs-fp32-reference max|diff| (T={t}): "
              f"{bound:.5f}")
        assert bound < 0.02, \
            f"kernel numeric bound blown: {bound} (indexing bug?)"
    compare("f32")
    compare("bf16")
    print("OK: kernel within bf16 accumulation noise of the fp32 reference")


if __name__ == "__main__":
    main()
