"""GSPMD sharding specs for the model pytrees.

Megatron-style tensor parallelism over the "model" axis, expressed purely
as NamedSharding annotations — XLA inserts the all-reduces (after o-proj
and down-proj contractions) and all-gathers automatically:

  column-parallel (shard out-features): q/k/v/qkv, gate/up, merger fc1
  row-parallel    (shard in-features):  o, proj(vision), down, fc2
  vocab-parallel:                       embed (rows), lm_head (cols)
  replicated:                           norms, biases of row-parallel layers

Optional FSDP: with ``fsdp=True`` every replicated-over-data weight is
additionally sharded over "data" on its largest dimension (ZeRO-3 style
resharding; XLA all-gathers per layer).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = {"q", "k", "v", "qkv", "gate", "up", "fc1"}
_ROW_PARALLEL = {"o", "proj", "down", "fc2"}


def _spec_for_path(path: tuple[str, ...], shape: tuple[int, ...],
                   fsdp: bool) -> P:
    names = [p for p in path if not p.isdigit()]
    leaf = names[-1]                     # "w" | "b" | "scale" | quantized
    # Quantized leaves shard like their bf16 counterparts.
    leaf = {"w_q": "w", "w_scale": "b"}.get(leaf, leaf)
    parent = names[-2] if len(names) >= 2 else ""

    if parent == "embed":
        spec = P("model", None)          # vocab rows
    elif parent == "lm_head":
        spec = P(None, "model") if leaf == "w" else P("model")
    elif parent == "patch_embed":
        spec = P(None, "model")
    elif parent in _COLUMN_PARALLEL:
        spec = P(None, "model") if leaf == "w" else P("model")
    elif parent in _ROW_PARALLEL:
        spec = P("model", None) if leaf == "w" else P(None)
    else:                                # norms, misc
        spec = P(*([None] * len(shape)))

    # Layer-stacked leaves (models/init.stack_layers) carry a leading
    # [L] dim the per-layer spec knows nothing about: replicate it.
    if ("layers" in names or "blocks" in names) and len(spec) < len(shape):
        spec = P(None, *spec)

    if fsdp:
        spec = _add_fsdp(spec, shape)
    return spec


def _add_fsdp(spec: P, shape: tuple[int, ...]) -> P:
    """Shard the largest not-yet-sharded dim over "data" (ZeRO-3)."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    free = [i for i, p in enumerate(parts) if p is None]
    if not free:
        return spec
    target = max(free, key=lambda i: shape[i])
    if shape[target] < 2:
        return spec
    parts[target] = "data"
    return P(*parts)


def param_shardings(mesh: Mesh, params: Any, fsdp: bool = False):
    """NamedSharding pytree matching ``params``' structure."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", None)) for k in path)
        keys = tuple(str(k) for k in keys)
        spec = _spec_for_path(keys, leaf.shape, fsdp)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard one array's batch axis over "data"; rest replicated."""
    parts = [None] * ndim
    parts[batch_axis] = "data"
    return NamedSharding(mesh, P(*parts))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params: Any, fsdp: bool = False):
    """Place a param pytree onto the mesh with TP(/FSDP) shardings."""
    shardings = param_shardings(mesh, params, fsdp=fsdp)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
