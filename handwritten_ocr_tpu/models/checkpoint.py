"""Native checkpoint save/restore (orbax).

Two uses:
  * offline conversion — pre-convert an HF safetensors snapshot (optionally
    int8-quantized) so engine startup skips the transpose/quantize work
    (``scripts/convert_checkpoint.py``);
  * training — persist params/opt_state between fine-tuning runs.

Checkpoints are orbax PyTree checkpoints plus a ``meta.json`` carrying the
model family and the original HF config for exact reconstruction.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax


def save_checkpoint(path: str | Path, params: Any, meta: dict) -> None:
    """Write params + metadata to ``path`` (created/overwritten)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path / "params", params, force=True)
    checkpointer.wait_until_finished()
    (path / "meta.json").write_text(json.dumps(meta, indent=2))


def load_checkpoint(path: str | Path, abstract_params: Any | None = None):
    """(params, meta) from a native checkpoint.

    ``abstract_params`` (a pytree of jax.ShapeDtypeStruct or arrays) guides
    restore placement/dtypes; None restores as saved.
    """
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    meta = json.loads((path / "meta.json").read_text())
    checkpointer = ocp.StandardCheckpointer()
    default_sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    if abstract_params is None:
        # Restore device-agnostically (a checkpoint saved on TPU must load
        # on CPU hosts and vice versa): build abstract arrays from the
        # checkpoint's own metadata instead of its recorded shardings.
        tree_meta = checkpointer.metadata(path / "params").item_metadata.tree
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=default_sharding),
            tree_meta)
    else:
        abstract = jax.tree_util.tree_map(
            lambda leaf: jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype,
                sharding=getattr(leaf, "sharding", None) or default_sharding),
            abstract_params)
    params = checkpointer.restore(path / "params", abstract)
    return params, meta
