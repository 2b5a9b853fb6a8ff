"""Parity tests for the fused append+attention decode kernel.

The kernel (ops/paged_decode_attention) runs through the Pallas
interpreter on CPU against a straight numpy reference: scatter-append
then full-window masked softmax. ``jax_default_matmul_precision=highest``
makes f32 matmuls exact, so any indexing/masking/DMA-ordering bug shows
as an O(1) error against a ~1e-5 tolerance.

Covers the shapes the serving loop actually issues (paged.py routes all
t <= 64 non-flash forwards here): plain decode steps (T=1), speculative
verify blocks (T=K+1, causal within the block, per-slot prefix validity),
inactive slots (n_valid=0 — output ignored, pool untouched), and appends
crossing page boundaries.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_ocr_tpu.ops.paged_decode_attention import (
    paged_append_attention)

L, N, BS, HKV, D = 2, 16, 16, 2, 128
HQ = 6
LAYER = 1


def reference(q, k_new, v_new, k_pool, v_pool, tables, start, n_valid):
    """Append + gather-window masked softmax, plain numpy float64."""
    k_pool = np.array(k_pool, np.float64)
    v_pool = np.array(v_pool, np.float64)
    s_, t_, hq, d = q.shape
    g = hq // HKV
    out = np.zeros((s_, t_, hq, d))
    for s in range(s_):
        for i in range(int(n_valid[s])):
            pos = int(start[s]) + i
            blk = int(tables[s, pos // BS])
            k_pool[LAYER, blk, pos % BS] = k_new[s, i]
            v_pool[LAYER, blk, pos % BS] = v_new[s, i]
        keys = k_pool[LAYER][np.array(tables[s])].reshape(-1, HKV, d)
        vals = v_pool[LAYER][np.array(tables[s])].reshape(-1, HKV, d)
        for t in range(t_):
            for h in range(hq):
                scores = (np.array(q[s, t, h], np.float64)
                          @ keys[:, h // g].T) * d ** -0.5
                allowed = np.arange(keys.shape[0]) <= int(start[s]) + t
                scores = np.where(allowed, scores, -np.inf)
                p = np.exp(scores - scores.max())
                p = np.where(allowed, p, 0)
                out[s, t, h] = (p / p.sum()) @ vals[:, h // g]
    return out, k_pool, v_pool


@pytest.fixture(autouse=True)
def _exact_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


def run_case(t, start, n_valid, seed=0):
    rng = np.random.default_rng(seed)
    s_ = len(start)
    q = rng.standard_normal((s_, t, HQ, D)).astype(np.float32)
    k_new = rng.standard_normal((s_, t, HKV, D)).astype(np.float32)
    v_new = rng.standard_normal((s_, t, HKV, D)).astype(np.float32)
    k_pool = rng.standard_normal((L, N, BS, HKV, D)).astype(np.float32)
    v_pool = rng.standard_normal((L, N, BS, HKV, D)).astype(np.float32)
    blocks = rng.permutation(np.arange(1, N))[: s_ * 3].reshape(s_, 3)
    tables = blocks.astype(np.int32)
    start = np.asarray(start, np.int32)
    n_valid = np.asarray(n_valid, np.int32)

    ref_out, ref_k, ref_v = reference(q, k_new, v_new, k_pool, v_pool,
                                      tables, start, n_valid)
    out, k2, v2 = paged_append_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_pool), jnp.asarray(v_pool), jnp.asarray(tables),
        jnp.asarray(start), jnp.asarray(n_valid),
        layer=LAYER, scale=D ** -0.5, interpret=True)
    out = np.asarray(out)
    for s in range(s_):
        nv = int(n_valid[s])
        if nv:
            np.testing.assert_allclose(out[s, :nv], ref_out[s, :nv],
                                       atol=2e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(k2), ref_k.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(v2), ref_v.astype(np.float32))


def test_decode_step():
    # T=1: live slots mid-page / page-boundary / fresh; one dead slot.
    run_case(1, start=[5, 15, 0, 40], n_valid=[1, 1, 1, 0])


def test_verify_block_causal():
    # T=5 verify: full drafts, partial prefix, dead slot; starts placed
    # so appends cross page boundaries (15+5 spans pages 0->1).
    run_case(5, start=[15, 3, 30], n_valid=[5, 3, 0])


def test_multi_page_contexts():
    # Long contexts spanning all 3 table pages exercise the double-
    # buffered page loop (odd/even buffer hand-off).
    run_case(1, start=[33, 47, 20], n_valid=[1, 1, 1], seed=3)


def test_pool_untouched_for_dead_slots():
    rng = np.random.default_rng(7)
    q = rng.standard_normal((2, 1, HQ, D)).astype(np.float32)
    kn = rng.standard_normal((2, 1, HKV, D)).astype(np.float32)
    vn = rng.standard_normal((2, 1, HKV, D)).astype(np.float32)
    k_pool = rng.standard_normal((L, N, BS, HKV, D)).astype(np.float32)
    v_pool = rng.standard_normal((L, N, BS, HKV, D)).astype(np.float32)
    tables = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    _, k2, v2 = paged_append_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(k_pool), jnp.asarray(v_pool), jnp.asarray(tables),
        jnp.asarray([3, 9], np.int32), jnp.asarray([0, 0], np.int32),
        layer=LAYER, scale=D ** -0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(k2), k_pool)
    np.testing.assert_array_equal(np.asarray(v2), v_pool)


def reference_quant(q, k_new, v_new, k_pool, v_pool, ks_pool, vs_pool,
                    tables, start, n_valid):
    """int8-KV reference: same quantization formula as the kernel
    (per token/head amax/127 over D, round-half-even), then dequantized
    full-window masked softmax."""
    k_pool = np.array(k_pool); v_pool = np.array(v_pool)
    ks_pool = np.array(ks_pool); vs_pool = np.array(vs_pool)
    s_, t_, hq, d = q.shape
    g = hq // HKV

    def quant(row):
        sc = max(np.abs(row).max(), 1e-6) / 127.0
        return np.round(row.astype(np.float64) / sc).astype(np.int8), sc

    out = np.zeros((s_, t_, hq, d))
    for s in range(s_):
        for i in range(int(n_valid[s])):
            pos = int(start[s]) + i
            blk = int(tables[s, pos // BS])
            for h in range(HKV):
                k_pool[LAYER, blk, pos % BS, h], ks_pool[
                    LAYER, blk, h, pos % BS] = quant(k_new[s, i, h])
                v_pool[LAYER, blk, pos % BS, h], vs_pool[
                    LAYER, blk, h, pos % BS] = quant(v_new[s, i, h])
        keys = (k_pool[LAYER][np.array(tables[s])].astype(np.float64)
                * ks_pool[LAYER][np.array(tables[s])].transpose(
                    0, 2, 1)[..., None]
                ).reshape(-1, HKV, d)
        vals = (v_pool[LAYER][np.array(tables[s])].astype(np.float64)
                * vs_pool[LAYER][np.array(tables[s])].transpose(
                    0, 2, 1)[..., None]
                ).reshape(-1, HKV, d)
        for t in range(t_):
            for h in range(hq):
                scores = (np.array(q[s, t, h], np.float64)
                          @ keys[:, h // g].T) * d ** -0.5
                allowed = np.arange(keys.shape[0]) <= int(start[s]) + t
                scores = np.where(allowed, scores, -np.inf)
                p = np.exp(scores - scores.max())
                p = np.where(allowed, p, 0)
                out[s, t, h] = (p / p.sum()) @ vals[:, h // g]
    return out, k_pool, v_pool, ks_pool, vs_pool


@pytest.mark.parametrize("t,start,n_valid", [
    (1, [5, 15, 0, 40], [1, 1, 1, 0]),
    (5, [15, 3, 30], [5, 3, 0]),
])
def test_quantized_kv(t, start, n_valid):
    rng = np.random.default_rng(11)
    s_ = len(start)
    q = rng.standard_normal((s_, t, HQ, D)).astype(np.float32)
    k_new = rng.standard_normal((s_, t, HKV, D)).astype(np.float32)
    v_new = rng.standard_normal((s_, t, HKV, D)).astype(np.float32)
    k_pool = rng.integers(-127, 128, (L, N, BS, HKV, D)).astype(np.int8)
    v_pool = rng.integers(-127, 128, (L, N, BS, HKV, D)).astype(np.int8)
    ks_pool = rng.uniform(0.001, 0.02, (L, N, HKV, BS)).astype(np.float32)
    vs_pool = rng.uniform(0.001, 0.02, (L, N, HKV, BS)).astype(np.float32)
    tables = rng.permutation(np.arange(1, N))[: s_ * 3].reshape(
        s_, 3).astype(np.int32)
    start = np.asarray(start, np.int32)
    n_valid = np.asarray(n_valid, np.int32)

    ref = reference_quant(q, k_new, v_new, k_pool, v_pool, ks_pool,
                          vs_pool, tables, start, n_valid)
    ref_out, ref_k, ref_v, ref_ks, ref_vs = ref
    out, k2, v2, ks2, vs2 = paged_append_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(k_pool), jnp.asarray(v_pool), jnp.asarray(tables),
        jnp.asarray(start), jnp.asarray(n_valid),
        jnp.asarray(ks_pool), jnp.asarray(vs_pool),
        layer=LAYER, scale=D ** -0.5, interpret=True)
    out = np.asarray(out)
    for s in range(s_):
        nv = int(n_valid[s])
        if nv:
            np.testing.assert_allclose(out[s, :nv], ref_out[s, :nv],
                                       atol=5e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(k2), ref_k)
    np.testing.assert_array_equal(np.asarray(v2), ref_v)
    np.testing.assert_allclose(np.asarray(ks2), ref_ks, atol=1e-7)
    np.testing.assert_allclose(np.asarray(vs2), ref_vs, atol=1e-7)


def test_quantized_attention_close_to_exact():
    """int8 KV attention output stays within ~1% of the bf16-exact
    output at realistic magnitudes — the quality bound the serving
    default relies on."""
    rng = np.random.default_rng(5)
    s_ = 2
    q = rng.standard_normal((s_, 1, HQ, D)).astype(np.float32)
    k_new = rng.standard_normal((s_, 1, HKV, D)).astype(np.float32)
    v_new = rng.standard_normal((s_, 1, HKV, D)).astype(np.float32)
    base_k = rng.standard_normal((L, N, BS, HKV, D)).astype(np.float32)
    base_v = rng.standard_normal((L, N, BS, HKV, D)).astype(np.float32)
    tables = rng.permutation(np.arange(1, N))[: s_ * 3].reshape(
        s_, 3).astype(np.int32)
    start = np.asarray([37, 20], np.int32)
    n_valid = np.asarray([1, 1], np.int32)

    exact, _, _ = reference(q, k_new, v_new, base_k, base_v,
                            tables, start, n_valid)
    from handwritten_ocr_tpu.models.paged import _quantize_rows
    kq, ks = (np.asarray(x) for x in _quantize_rows(
        jnp.asarray(base_k.reshape(1, -1, HKV, D))))
    vq, vs = (np.asarray(x) for x in _quantize_rows(
        jnp.asarray(base_v.reshape(1, -1, HKV, D))))
    ks = ks.reshape(L, N, BS, HKV).transpose(0, 1, 3, 2)
    vs = vs.reshape(L, N, BS, HKV).transpose(0, 1, 3, 2)
    out, *_ = paged_append_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        jnp.asarray(kq.reshape(base_k.shape)),
        jnp.asarray(vq.reshape(base_v.shape)), jnp.asarray(tables),
        jnp.asarray(start), jnp.asarray(n_valid),
        jnp.asarray(np.ascontiguousarray(ks)),
        jnp.asarray(np.ascontiguousarray(vs)),
        layer=LAYER, scale=D ** -0.5, interpret=True)
    err = np.abs(np.asarray(out)[:, 0] - exact[:, 0]).max()
    assert err < 0.02, err


@pytest.mark.parametrize("hkv,hd,expect_kernel", [(4, 128, True),
                                                  (2, 64, False),
                                                  (4, 96, False),
                                                  (8, 256, True)])
def test_kernel_alignment_guard(monkeypatch, hkv, hd, expect_kernel):
    """models/paged.py routes the fused kernel only at Mosaic-alignable
    page-slice shapes ([Hkv, D] with D%128==0, Hkv%4==0); anything else
    takes the portable scatter+gather path instead of failing to compile
    on TPU (the tiny trained-fidelity config hit exactly that)."""
    from handwritten_ocr_tpu.models import paged as paged_mod
    from handwritten_ocr_tpu.models.paged import _paged_self_attention
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config
    from handwritten_ocr_tpu.ops import dispatch

    monkeypatch.setattr(dispatch, "paged_attention_mode", lambda: "compiled")

    called = {}

    def sentinel_kernel(*args, **kwargs):
        called["kernel"] = True
        raise RuntimeError("stop after dispatch decision")

    import handwritten_ocr_tpu.ops.paged_decode_attention as pda
    monkeypatch.setattr(pda, "paged_append_attention", sentinel_kernel)

    hq = hkv * 2
    cfg = Qwen3Config(vocab_size=64, hidden_size=32, intermediate_size=32,
                      num_hidden_layers=1, num_attention_heads=hq,
                      num_key_value_heads=hkv, head_dim=hd, eos_token_id=-1)
    rng = np.random.default_rng(0)
    b, t = 2, 1
    layer = {
        "q": {"w": jnp.asarray(rng.standard_normal(
            (32, hq * hd)).astype(np.float32))},
        "k": {"w": jnp.asarray(rng.standard_normal(
            (32, hkv * hd)).astype(np.float32))},
        "v": {"w": jnp.asarray(rng.standard_normal(
            (32, hkv * hd)).astype(np.float32))},
        "o": {"w": jnp.asarray(rng.standard_normal(
            (hq * hd, 32)).astype(np.float32))},
    }
    x = jnp.asarray(rng.standard_normal((b, t, 32)).astype(np.float32))
    cos = jnp.ones((b, t, hd), jnp.float32)
    sin = jnp.zeros((b, t, hd), jnp.float32)
    pools = (jnp.zeros((1, 4, 16, hkv, hd), jnp.float32),
             jnp.zeros((1, 4, 16, hkv, hd), jnp.float32), None, None)
    tables = jnp.asarray([[0, 1], [2, 3]], np.int32)
    start = jnp.asarray([3, 5], np.int32)
    n_valid = jnp.asarray([1, 1], np.int32)

    try:
        out, _ = _paged_self_attention(layer, cfg, x, cos, sin, 0, pools,
                                       tables, start, n_valid, fresh=False)
    except RuntimeError as e:
        assert "stop after dispatch decision" in str(e)

    assert called.get("kernel", False) == expect_kernel
    if not expect_kernel:
        assert out.shape == (b, t, 32)
