"""Pallas int8 weight-only matmul: dequantize in VMEM, not in HBM.

XLA hoists a naive ``w8.astype(bf16)`` out of decode loops, materializing
a bf16 weight copy and erasing the bandwidth win (measured: identical
us/matvec). This kernel streams the int8 blocks HBM→VMEM, widens on the
VPU, and feeds the MXU — HBM traffic stays 1 byte/weight, which is the
whole point for the weight-bandwidth-bound decode step.

Layout: x [B, IN] (activations, small), w8 [IN, OUT] int8,
scale [OUT] f32 per-output-channel → out [B, OUT].
Grid: (out_blocks, in_blocks), in-dimension innermost with an f32 VMEM
accumulator across in-blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_in_blocks: int):
    ii = pl.program_id(1)

    @pl.when(ii == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                                   # [B, BIN]
    w = w_ref[:].astype(x.dtype)                   # [BIN, BOUT] widened in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ii == n_in_blocks - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


def int8_matmul_supported(d_in: int, d_out: int) -> bool:
    """Whether the kernel path is worthwhile (padding handles alignment)."""
    return d_in >= 128 and d_out >= 128


@functools.partial(jax.jit, static_argnames=("block_in", "block_out",
                                             "interpret", "out_dtype"))
def int8_matmul(
    x: jax.Array,        # [B, IN]
    w8: jax.Array,       # [IN, OUT] int8
    scale: jax.Array,    # [OUT] f32
    *,
    block_in: int = 2048,
    block_out: int = 1024,
    interpret: bool = False,
    out_dtype=None,
) -> jax.Array:
    """(x @ dequant(w8)) with per-output-channel scales.

    ``out_dtype`` defaults to x.dtype; pass ``jnp.float32`` for the
    lm_head path, whose argmax contract wants f32 accumulation AND f32
    output (the scale is applied to the f32 accumulator in-kernel either
    way)."""
    batch, d_in = x.shape
    d_out = w8.shape[1]
    # Ragged final blocks: Pallas TPU masks out-of-bounds block reads
    # (garbage int8 values — finite after widening) and clips OOB
    # writes, so the WEIGHT is never padded. The old pad path
    # materialized a padded copy of the whole weight inside the decode
    # program whenever no >=384 divisor block existed — at the 8B head
    # (151936 = 128·1187, 1187 prime) that copy cost ~2 ms/step and
    # dropped the head to 28% of its HBM floor. Only x is padded (rows
    # of zeros, a few KB): the final in-block's garbage weight rows
    # multiply those zero activation columns, contributing exactly 0.
    block_in = min(block_in, _round_up(d_in, 128))
    block_out = min(block_out, _round_up(d_out, 128))
    in_pad = (-d_in) % block_in
    if in_pad:
        x = jnp.pad(x, ((0, 0), (0, in_pad)))
    n_in_blocks = (d_in + block_in - 1) // block_in
    n_out_blocks = (d_out + block_out - 1) // block_out

    kernel = functools.partial(_kernel, n_in_blocks=n_in_blocks)
    out = pl.pallas_call(
        kernel,
        grid=(n_out_blocks, n_in_blocks),
        in_specs=[
            pl.BlockSpec((1, batch, block_in), lambda oi, ii: (0, 0, ii)),
            pl.BlockSpec((block_in, block_out), lambda oi, ii: (ii, oi)),
            pl.BlockSpec((1, block_out), lambda oi, ii: (0, oi)),
        ],
        out_specs=pl.BlockSpec((1, batch, block_out), lambda oi, ii: (0, 0, oi)),
        out_shape=jax.ShapeDtypeStruct((1, batch, d_out),
                                       out_dtype or x.dtype),
        scratch_shapes=[pltpu.VMEM((batch, block_out), jnp.float32)],
        interpret=interpret,
    )(x[None], w8, scale.astype(jnp.float32)[None])
    return out[0]


def _round_up(value: int, multiple: int) -> int:
    return -(-value // multiple) * multiple
