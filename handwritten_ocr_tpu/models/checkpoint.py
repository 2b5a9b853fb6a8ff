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
    if abstract_params is not None:
        abstract = jax.tree_util.tree_map(
            lambda leaf: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype),
            abstract_params)
        params = checkpointer.restore(path / "params", abstract)
    else:
        params = checkpointer.restore(path / "params")
    return params, meta
