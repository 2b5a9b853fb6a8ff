"""Device mesh construction.

Axes (config.MESH_AXES):
  "data"  — pages / batch (data parallel, FSDP resharding)
  "model" — tensor parallel (attention heads, MLP columns)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, model_parallel: int | None = None) -> tuple[int, int]:
    """(data, model) shape: largest power-of-two model axis ≤ requested."""
    if model_parallel is None:
        # Default: favor data parallelism; model axis 1 unless the caller
        # asks otherwise (OCR page workloads are embarrassingly data
        # parallel; TP is for fitting big models).
        model_parallel = 1
    if n_devices % model_parallel:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"model_parallel={model_parallel}")
    return n_devices // model_parallel, model_parallel


def make_mesh(n_devices: int | None = None,
              model_parallel: int | None = None,
              devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    data, model = mesh_shape_for(n_devices, model_parallel)
    grid = np.array(devices).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
