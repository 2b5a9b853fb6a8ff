"""Ring (context-parallel) attention vs single-device reference.

Runs on the 8-device virtual CPU mesh (conftest) — the same sharded
execution path a real multi-chip slice takes, with ``lax.ppermute``
rotating KV chunks around the ring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from handwritten_ocr_tpu.parallel.context_parallel import ring_attention


def make_mesh(n, axis="data"):
    devices = np.array(jax.devices()[:n])
    return Mesh(devices, axis_names=(axis,))


def reference(q, k, v, causal):
    d = q.shape[-1]
    hq, hkv = q.shape[2], k.shape[2]
    if hq != hkv:
        k = np.repeat(k, hq // hkv, axis=2)
        v = np.repeat(v, hq // hkv, axis=2)
    scores = np.einsum("bqhd,bkhd->bhqk", q.astype(np.float64),
                       k.astype(np.float64)) * d ** -0.5
    if causal:
        s = q.shape[1]
        mask = np.tril(np.ones((s, s), bool))
        scores = np.where(mask[None, None], scores, -np.inf)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v.astype(np.float64))


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_ring_matches_reference(causal, hq, hkv):
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    b, s, d = 2, 64, 32
    q = rng.standard_normal((b, s, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    got = np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), mesh=mesh,
                                    causal=causal))
    want = reference(q, k, v, causal)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=0)


def test_ring_mesh_size_independent():
    """Same numbers whichever ring size computes them."""
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 48, 2, 16
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    outs = [np.asarray(ring_attention(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), mesh=make_mesh(n),
                                      causal=True))
            for n in (2, 4, 8)]
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5, rtol=0)
    np.testing.assert_allclose(outs[0], outs[2], atol=2e-5, rtol=0)


def test_rejects_indivisible_sequence():
    with pytest.raises(ValueError):
        ring_attention(jnp.zeros((1, 30, 2, 16)), jnp.zeros((1, 30, 2, 16)),
                       jnp.zeros((1, 30, 2, 16)), mesh=make_mesh(8))
