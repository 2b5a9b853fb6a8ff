#!/usr/bin/env python3
"""Vision-tower component microbenchmark (7B dims, 1 Mpx grid, batch 8).

Round-2 stall: the tower measures ~50% MFU and two candidate fixes were
dead ends (int8 weights neutral, per-window flash slower). This script
decomposes one window block + one full-attention block into components
with per-component FLOP/byte accounting, so the next fusion targets the
REAL loss instead of a guess.

Components timed (each in one fori_loop dispatch, value-dependent carry):
  patch_embed, qkv matmul, rope, window scores+softmax+pv (the einsum
  path), proj, mlp, rms_norms, full window block, full global block,
  whole tower.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

PEAK = 197e12          # v5e bf16 MXU peak FLOP/s
HBM = 819e9
N = 30


def sync(x):
    """1-element d2h fetch: jax.block_until_ready does NOT synchronize
    on the axon tunnel (round-5 finding — the old block_until_ready
    sync here measured dispatch, not execution)."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return 0.0


def loop_time(make_body, init, iters=N):
    """Per-iteration time by differencing two loop lengths (N and 3N) —
    cancels the flat multi-ms d2h pull cost of the tunnel sync."""
    import jax

    def make(n):
        @jax.jit
        def run(carry):
            return jax.lax.fori_loop(0, n, make_body, carry)
        return run

    run1, run3 = make(iters), make(3 * iters)
    sync(run1(init))
    sync(run3(init))
    start = time.perf_counter()
    sync(run1(init))
    t1 = time.perf_counter() - start
    start = time.perf_counter()
    sync(run3(init))
    t3 = time.perf_counter() - start
    return max(t3 - t1, 1e-9) / (2 * iters)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.models.init import init_vision
    from handwritten_ocr_tpu.models.layers import rms_norm, swiglu_mlp
    from handwritten_ocr_tpu.models.qwen25vl.config import VisionConfig
    from handwritten_ocr_tpu.models.qwen25vl.vision import (
        _attend_full, _attend_windows, plan_grid, vision_encode)

    assert jax.default_backend() != "cpu", "run on the chip"
    cfg = VisionConfig()                      # 7B dims: 1280/3420/16h/32L
    grid = (1, 66, 48)                        # the bench's 924x672 page
    b = 8
    plan = plan_grid(cfg, grid)
    s = grid[0] * grid[1] * grid[2]
    p = plan.n_windows * plan.window_len
    d = cfg.hidden_size
    print(f"grid {grid}: seq {s}, padded {p} "
          f"({plan.n_windows} windows x {plan.window_len})")

    key = jax.random.PRNGKey(0)
    params = init_vision(key, cfg, dtype=jnp.bfloat16)
    layer = jax.tree_util.tree_map(lambda x: x[0], params["blocks"])
    x0 = jax.random.normal(key, (b, p, d), jnp.bfloat16)

    # PRODUCTION patches, not random bf16: the bench path emits f32 from
    # pack_image_device and the tower casts at entry. Round 3 tuned
    # kernels against bf16 random patches here while the bench compiled
    # f32 blocks — this harness now compiles the exact production
    # programs (same preprocess chain, same pack, same dtype).
    import bench
    from handwritten_ocr_tpu.models.processor import pack_image_device
    from handwritten_ocr_tpu.ops.bank import preprocess_chain

    pages = np.stack(bench.synthetic_pages(b))

    @jax.jit
    def prep(batch_u8):
        def one(img):
            processed = preprocess_chain(img, ["high_contrast", "binarize"])
            return pack_image_device(processed)[0]
        return jax.vmap(one)(batch_u8)

    patches0 = prep(jnp.asarray(pages))
    print(f"patches: {patches0.shape} {patches0.dtype} (production pack), "
          f"tower compute dtype {params['patch_embed']['w'].dtype}")

    valid = jnp.asarray(plan.valid)
    cos = jnp.asarray(plan.cos_pad)
    sin = jnp.asarray(plan.sin_pad)
    win_valid = valid.reshape(plan.n_windows, plan.window_len)
    cos_w = cos.reshape(plan.n_windows, plan.window_len, -1)
    sin_w = sin.reshape(plan.n_windows, plan.window_len, -1)

    def dep(x, y):
        # Consume ALL of y (full reduction): depending on one element lets
        # XLA dead-code-eliminate most of a matmul (observed >100% "MFU").
        s = jnp.sum(y, dtype=jnp.float32).astype(x.dtype)
        return x + s * jnp.asarray(1e-30, x.dtype)

    rows = b * p
    cases = {}

    def report(name, t, flops=0.0, nbytes=0.0):
        mfu = 100 * flops / PEAK / t if flops else 0.0
        bw = 100 * nbytes / HBM / t if nbytes else 0.0
        lim = f"{mfu:5.1f}% MFU" if flops else f"{bw:5.1f}% HBM"
        print(f"  {name:<26s} {t*1e3:8.3f} ms  {lim}")
        cases[name] = t

    print(f"== components (batch {b}, {rows} padded tokens) ==")

    def patch_embed(i, x):
        w = params["patch_embed"]["w"]
        y = patches0.astype(w.dtype) @ w       # production entry cast
        return dep(x, y)
    report("patch_embed", loop_time(patch_embed, x0),
           flops=2 * b * s * 1176 * d)

    def qkv(i, x):
        from handwritten_ocr_tpu.models.layers import linear
        y = linear(layer["attn"]["qkv"], x)
        return dep(x, y)
    report("qkv matmul", loop_time(qkv, x0), flops=2 * rows * d * 3 * d)

    def rope(i, x):
        from handwritten_ocr_tpu.models.layers import apply_rope
        q = x.reshape(b, p, cfg.num_heads, -1)
        qq, kk = apply_rope(q, q, cos[None, :, None, :], sin[None, :, None, :])
        return dep(x, qq + kk)
    report("rope (q+k)", loop_time(rope, x0),
           nbytes=4 * rows * d * 2)

    def win_attn_core(i, x):
        xw = x.reshape(b, plan.n_windows, plan.window_len, cfg.num_heads, -1)
        scale = cfg.head_dim ** -0.5
        scores = jnp.einsum("bwthd,bwshd->bwhts", xw, xw,
                            preferred_element_type=jnp.float32) * scale
        mask = win_valid[None, :, None, None, :]
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bwhts,bwshd->bwthd", weights, xw)
        return dep(x, out)
    l = plan.window_len
    attn_flops = 2 * 2 * b * plan.n_windows * cfg.num_heads * l * l \
        * cfg.head_dim
    report("win scores+softmax+pv", loop_time(win_attn_core, x0),
           flops=attn_flops)

    def proj(i, x):
        from handwritten_ocr_tpu.models.layers import linear
        y = linear(layer["attn"]["proj"], x)
        return dep(x, y)
    report("proj matmul", loop_time(proj, x0), flops=2 * rows * d * d)

    def mlp(i, x):
        y = swiglu_mlp(layer["mlp"], x)
        return dep(x, y)
    report("mlp (gate/up/down)", loop_time(mlp, x0),
           flops=2 * rows * d * cfg.intermediate_size * 3)

    def norms(i, x):
        y = rms_norm(layer["norm1"], x, 1e-6)
        z = rms_norm(layer["norm2"], y, 1e-6)
        return dep(x, z)
    report("2x rms_norm", loop_time(norms, x0), nbytes=4 * rows * d * 2)

    def win_block(i, x):
        normed = rms_norm(layer["norm1"], x, 1e-6)
        attn = _attend_windows(layer["attn"], cfg, normed,
                               cos_w, sin_w, win_valid)
        x = x + attn
        x = x + swiglu_mlp(layer["mlp"], rms_norm(layer["norm2"], x, 1e-6))
        return x
    block_flops = (2 * rows * d * 3 * d + attn_flops + 2 * rows * d * d
                   + 2 * rows * d * cfg.intermediate_size * 3)
    t_win = loop_time(win_block, x0)
    report("FULL window block", t_win, flops=block_flops)

    def full_block(i, x):
        normed = rms_norm(layer["norm1"], x, 1e-6)
        attn = _attend_full(layer["attn"], cfg, normed, cos, sin, valid)
        x = x + attn
        x = x + swiglu_mlp(layer["mlp"], rms_norm(layer["norm2"], x, 1e-6))
        return x
    gattn_flops = 2 * 2 * b * cfg.num_heads * p * p * cfg.head_dim
    t_full = loop_time(full_block, x0, iters=10)
    report("FULL global block", t_full,
           flops=block_flops - attn_flops + gattn_flops)

    n_win_layers = cfg.depth - len(cfg.fullatt_block_indexes)
    est = n_win_layers * t_win + len(cfg.fullatt_block_indexes) * t_full
    print(f"  est. tower from blocks: {est*1e3:.1f} ms")

    def tower(i, x):
        y = vision_encode(params, cfg, patches0, grid)
        return dep(x, y)
    tower_flops = (2 * b * s * 1176 * d
                   + n_win_layers * block_flops
                   + len(cfg.fullatt_block_indexes)
                   * (block_flops - attn_flops + gattn_flops)
                   + 2 * b * (s // 4) * (4 * d) * (4 * d)
                   + 2 * b * (s // 4) * (4 * d) * cfg.out_hidden_size)
    t_tower = loop_time(tower, x0, iters=5)
    report("WHOLE tower", t_tower, flops=tower_flops)
    print(f"  tower: {t_tower*1e3/b*8:.1f} ms / 8 pages "
          f"({t_tower/b*1e3:.1f} ms/page)")


if __name__ == "__main__":
    main()
