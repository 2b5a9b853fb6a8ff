"""Multi-host distributed runtime: ``jax.distributed`` over ICI + DCN.

SURVEY.md §2.2/§5.8 names the comm-backend obligation: XLA collectives
over ICI within a slice, DCN across slices, via ``jax.distributed``. The
reference's only inter-process communication is an HTTP hop to a local
Ollama daemon (ref tools.py:175-181); here every process joins a global
JAX process group instead — local chips appear in ``jax.devices()``,
GSPMD programs span them, and XLA routes collectives over ICI
(intra-slice) or DCN (inter-slice) automatically.

Single-process use is untouched: :func:`initialize_from_env` is a no-op
unless the environment opts in.

Env contract (cluster schedulers on TPU pods can instead rely on JAX's
autodetection by calling ``initialize_from_env(auto=True)`` with none of
these set):

  ``HOCR_DIST_COORD``    coordinator ``host:port`` (process 0's address)
  ``HOCR_DIST_NPROCS``   total number of processes in the job
  ``HOCR_DIST_PROC_ID``  this process's rank, ``0..NPROCS-1``

Tested by ``tests/test_distributed.py``: a 2-process × 4-CPU-device
dryrun asserts a TP+DP-sharded read forward over the 8-device global
mesh matches single-process execution exactly (heavy tier; the same
code path scales to multi-host TPU slices unchanged).
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import numpy as np

from handwritten_ocr_tpu.parallel.mesh import make_mesh

_INITIALIZED = False


def distributed_env() -> dict | None:
    """The HOCR_DIST_* job description, or None when unset/solo."""
    coord = os.environ.get("HOCR_DIST_COORD")
    nprocs = os.environ.get("HOCR_DIST_NPROCS")
    if not coord or not nprocs or int(nprocs) < 2:
        return None
    return {
        "coordinator_address": coord,
        "num_processes": int(nprocs),
        "process_id": int(os.environ.get("HOCR_DIST_PROC_ID", "0")),
    }


def initialize_from_env(auto: bool = False) -> bool:
    """Join the process group described by HOCR_DIST_*; idempotent.

    Returns True when this process is part of a multi-process job
    (after initialization), False for ordinary single-process runs.
    With ``auto=True`` and no HOCR_DIST_* set, fall through to JAX's
    cluster autodetection (TPU pod metadata / SLURM) — harmless
    single-process no-op when no cluster is detected.
    """
    global _INITIALIZED
    env = distributed_env()
    if _INITIALIZED:
        return jax.process_count() > 1
    if env is None:
        if auto:
            try:
                jax.distributed.initialize()
                _INITIALIZED = True
            except Exception:
                return False
            return jax.process_count() > 1
        return False
    jax.distributed.initialize(**env)
    _INITIALIZED = True
    return True


def is_coordinator() -> bool:
    """True in the process that should own side effects (artifact
    writes, console output) — process 0, or any solo process."""
    return jax.process_index() == 0


def global_mesh(model_parallel: int | None = None):
    """("data", "model") mesh over the GLOBAL device set (all
    processes). On a multi-host slice the "model" axis should stay
    within a host's ICI neighborhood — jax.devices() orders devices
    process-major, so reshape keeps each host's chips adjacent and the
    TP collectives ride ICI while the "data" axis spans DCN."""
    return make_mesh(devices=jax.devices(), model_parallel=model_parallel)


def shard_host_batch(mesh, per_index: Callable[[tuple], np.ndarray],
                     global_shape: tuple, sharding=None):
    """Build a GLOBAL batch array from per-shard host data.

    ``per_index`` receives the global index (a tuple of slices) of one
    shard and returns its host data — each process is only asked for the
    shards its local devices hold, so a folder workload loads/decodes
    only its own pages (no full-batch broadcast over DCN).
    """
    from handwritten_ocr_tpu.parallel.sharding import data_sharding
    if sharding is None:
        sharding = data_sharding(mesh, len(global_shape))
    return jax.make_array_from_callback(global_shape, sharding, per_index)


def replicate_params(mesh, params, fsdp: bool = False):
    """Place a host-resident param pytree onto the global mesh with the
    standard TP(/FSDP) shardings. Every process must hold the SAME host
    values (same checkpoint / same init seed) — each contributes the
    shards its local devices own."""
    from handwritten_ocr_tpu.parallel.sharding import param_shardings

    shardings = param_shardings(mesh, params, fsdp=fsdp)

    def place(leaf, sharding):
        host = np.asarray(leaf)
        return jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx])

    return jax.tree_util.tree_map(place, params, shardings)
