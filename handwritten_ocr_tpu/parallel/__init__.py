"""Parallelism: device mesh, sharding specs, multi-chip batch running.

The reference is strictly single-process/single-device (SURVEY.md §2.2);
everything here is new TPU-native capability:
  * ``mesh``      — ("data", "model") mesh construction over ICI.
  * ``sharding``  — GSPMD NamedSharding specs: Megatron-style tensor
    parallelism for both model families, data/FSDP batch sharding; XLA
    inserts the collectives.
  * ``batch``     — pages sharded across chips for folder workloads.
  * ``context_parallel`` — ring attention: sequence-sharded long-context
    prefill with KV chunks rotated over ICI via ``ppermute``.
  * ``distributed`` — multi-host runtime: ``jax.distributed`` process
    groups (ICI within a slice, DCN across slices), global meshes, and
    per-host batch assembly.
"""

from handwritten_ocr_tpu.parallel.context_parallel import ring_attention
from handwritten_ocr_tpu.parallel.distributed import (
    global_mesh,
    initialize_from_env,
    is_coordinator,
)
from handwritten_ocr_tpu.parallel.mesh import make_mesh, mesh_shape_for
from handwritten_ocr_tpu.parallel.sharding import (
    data_sharding,
    param_shardings,
    replicated,
)

__all__ = [
    "make_mesh", "mesh_shape_for",
    "param_shardings", "data_sharding", "replicated", "ring_attention",
    "initialize_from_env", "global_mesh", "is_coordinator",
]
