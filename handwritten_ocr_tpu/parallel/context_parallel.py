"""Context-parallel (ring) attention: sequence-sharded long-context prefill.

SURVEY §5.7 stretch component. The reference's only long-input pressure
point is the editor/arbitrator prompt embedding several full
transcriptions (ref agents.py:262-267, 319-327); sequence lengths stay
modest, so single-chip flash attention handles production shapes. This
module provides the scaling escape hatch anyway: attention whose
sequence dimension is sharded over a mesh axis, with KV chunks rotated
around the ring via ``lax.ppermute`` so no device ever materializes the
full sequence — the TPU-native equivalent of ring/blockwise attention
(ICI neighbor hops instead of an all-gather).

Design:
- ``shard_map`` over the mesh axis; each device holds contiguous
  [B, S/n, H, D] chunks of q, k, v.
- n ring steps. At step s, a device holding query chunk i computes
  blockwise attention against kv chunk j = (i - s) mod n and merges via
  the running (m, l, acc) online-softmax state — numerically the flash
  accumulation, so results match single-device attention to fp
  tolerance.
- Causal mode skips future chunks (j > i) entirely: their contribution
  is masked anyway, so the ring does compute only for the lower
  triangle; the kv rotation still completes every step to keep the
  collective schedule uniform (SPMD requires all devices to issue the
  same ppermute).
- Accumulation in fp32 regardless of input dtype.

Scope note: ring attention trades one all-gather for n neighbor hops
with compute overlap potential; at the sequence lengths this pipeline
sees, either works — the value here is that arbitration over arbitrarily
many page transcriptions scales beyond one chip's HBM without new code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _chunk_attention(q, k, v, scale, row_offset, col_offset, causal):
    """Blockwise attention of one (q-chunk, kv-chunk) pair.

    q: [B, Sq, H, D]; k/v: [B, Sk, H, D] (H = q heads; kv already
    group-expanded by the caller for GQA). Returns the unnormalized
    online-softmax triple (m [B, Sq, H, 1], l [B, Sq, H, 1],
    acc [B, Sq, H, D]) for this chunk, with causal masking by absolute
    position (row_offset/col_offset are the chunks' global offsets).
    """
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if causal:
        rows = row_offset + jnp.arange(q.shape[1])[:, None]
        cols = col_offset + jnp.arange(k.shape[1])[None, :]
        scores = jnp.where((cols <= rows)[None, None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)              # [B, H, Sq, 1]
    m = jnp.maximum(m, -3.4e38)                              # all-masked rows
    p = jnp.exp(scores - m)
    p = jnp.where(jnp.isneginf(scores), 0.0, p)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    # [B, H, Sq, 1] -> [B, Sq, H, 1]
    return m.transpose(0, 2, 1, 3), l.transpose(0, 2, 1, 3), acc


def _merge(state, delta):
    """Merge two online-softmax partial states."""
    m0, l0, acc0 = state
    m1, l1, acc1 = delta
    m = jnp.maximum(m0, m1)
    a0 = jnp.exp(m0 - m)
    a1 = jnp.exp(m1 - m)
    return m, a0 * l0 + a1 * l1, a0 * acc0 + a1 * acc1


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   mesh: Mesh, axis: str = "data",
                   causal: bool = False,
                   scale: float | None = None) -> jax.Array:
    """Attention over sequence-sharded q/k/v [B, S, Hq, D] / [B, S, Hkv, D].

    S must divide evenly by the mesh axis size; inputs may be unsharded
    (they are placed) or already sharded along S. Returns [B, S, Hq, D]
    in q's dtype, sharded the same way. GQA is handled by repeating kv
    heads inside each device's chunk (no extra HBM across devices).
    """
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    n = mesh.shape[axis]
    if s % n:
        raise ValueError(f"sequence {s} not divisible by {axis}={n}")
    if scale is None:
        scale = d ** -0.5
    group = hq // hkv
    chunk = s // n

    seq_sharding = NamedSharding(mesh, P(None, axis))
    q, k, v = (jax.device_put(x, seq_sharding) for x in (q, k, v))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis))
    def _ring(q_c, k_c, v_c):
        idx = jax.lax.axis_index(axis)
        if group > 1:
            k_c = jnp.repeat(k_c, group, axis=2)
            v_c = jnp.repeat(v_c, group, axis=2)
        row_off = idx * chunk
        zero = (jnp.full((b, chunk, hq, 1), -jnp.inf, jnp.float32),
                jnp.zeros((b, chunk, hq, 1), jnp.float32),
                jnp.zeros((b, chunk, hq, d), jnp.float32))
        # The computed state is device-varying; the init must carry the
        # same varying-axis type for the fori carry to typecheck.
        zero = jax.tree.map(
            lambda x: jax.lax.pcast(x, (axis,), to="varying"), zero)
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(s_i, carry):
            state, k_r, v_r = carry
            src = (idx - s_i) % n                  # whose kv we hold now
            col_off = src * chunk

            def attend(state):
                delta = _chunk_attention(q_c, k_r, v_r, scale,
                                         row_off, col_off, causal)
                return _merge(state, delta)

            if causal:
                state = jax.lax.cond(col_off <= row_off + chunk - 1,
                                     attend, lambda st: st, state)
            else:
                state = attend(state)
            # Rotate kv to the next device (uniform schedule every step;
            # the final rotation restores the original placement).
            k_r = jax.lax.ppermute(k_r, axis, perm)
            v_r = jax.lax.ppermute(v_r, axis, perm)
            return state, k_r, v_r

        (m, l, acc), _, _ = jax.lax.fori_loop(
            0, n, step, (zero, k_c, v_c))
        return (acc / jnp.maximum(l, 1e-30)).astype(q_c.dtype)

    return _ring(q, k, v)
