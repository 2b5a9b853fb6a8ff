"""Multi-host distributed runtime (parallel/distributed.py).

SURVEY.md §5.8: the comm backend is ``jax.distributed`` — ICI within a
slice, DCN across slices. No multi-host TPU slice exists on this host,
so the correctness dryrun runs the REAL multi-process path on CPU: two
OS processes × 4 virtual CPU devices each join one process group, build
the 8-device global mesh, and run a TP+DP-sharded read forward whose
replicated output must match single-process execution (collectives ride
Gloo here; the program is identical on a TPU slice where they ride
ICI/DCN).

The fast tests cover the env contract and the single-process no-op.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def test_initialize_noop_without_env(monkeypatch):
    from handwritten_ocr_tpu.parallel import distributed

    for var in ("HOCR_DIST_COORD", "HOCR_DIST_NPROCS", "HOCR_DIST_PROC_ID"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.distributed_env() is None
    assert distributed.initialize_from_env() is False
    assert distributed.is_coordinator()          # solo process acts as rank 0


def test_distributed_env_parses(monkeypatch):
    from handwritten_ocr_tpu.parallel import distributed

    monkeypatch.setenv("HOCR_DIST_COORD", "10.0.0.1:1234")
    monkeypatch.setenv("HOCR_DIST_NPROCS", "4")
    monkeypatch.setenv("HOCR_DIST_PROC_ID", "2")
    env = distributed.distributed_env()
    assert env == {"coordinator_address": "10.0.0.1:1234",
                   "num_processes": 4, "process_id": 2}
    # A 1-process "job" is solo.
    monkeypatch.setenv("HOCR_DIST_NPROCS", "1")
    assert distributed.distributed_env() is None


def test_global_mesh_and_host_batch_single_process():
    """Single-process semantics of the multi-host helpers on the 8-dev
    virtual mesh: shard_host_batch only asks for owned shards and the
    assembled array round-trips; replicate_params matches device_put."""
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.parallel import distributed

    mesh = distributed.global_mesh(model_parallel=2)
    assert mesh.devices.size == len(jax.devices())

    data = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    asked = []

    def per_index(idx):
        asked.append(idx)
        return data[idx]

    batch = distributed.shard_host_batch(mesh, per_index, data.shape)
    np.testing.assert_array_equal(np.asarray(batch), data)
    assert asked                                   # callback-driven loads

    params = {"layers": {"mlp": {"down": {"w": np.arange(8, dtype=np.float32)
                                          .reshape(4, 2)}}}}
    placed = distributed.replicate_params(mesh, params)
    np.testing.assert_array_equal(
        np.asarray(placed["layers"]["mlp"]["down"]["w"]),
        params["layers"]["mlp"]["down"]["w"])
    got = jax.jit(lambda p, x: x @ p["layers"]["mlp"]["down"]["w"])(
        placed, jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(got),
                               np.ones((2, 4)) @ params["layers"]["mlp"]
                               ["down"]["w"])


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_read_matches_single(tmp_path):
    """HEAVY: 2 processes × 4 CPU devices — TP2×DP4 read forward over
    the global mesh == single-process logits, through the production
    helpers (initialize_from_env, global_mesh, replicate_params,
    shard_host_batch). The exact program a 2-host TPU slice runs."""
    port = _free_port()
    procs = []
    for rank in (0, 1):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            HOCR_DIST_COORD=f"localhost:{port}",
            HOCR_DIST_NPROCS="2",
            HOCR_DIST_PROC_ID=str(rank),
            HOCR_DIST_CHILD_OUT=str(tmp_path / f"rank{rank}.json"),
        )
        env.pop("HOCR_TEST_TPU", None)
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--dist-child"], env=env,
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=420)
        outs.append(out.decode(errors="replace"))
    for rank, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
    for rank in (0, 1):
        result = json.loads((tmp_path / f"rank{rank}.json").read_text())
        assert result["global_devices"] == 8
        assert result["local_devices"] == 4
        assert result["process_count"] == 2
        assert result["max_abs_err"] < 1e-5, result
        assert result["is_coordinator"] == (rank == 0)


def _dist_child() -> None:
    """Runs in each spawned process (see heavy test above)."""
    sys.path.insert(0, str(REPO))
    import jax
    jax.config.update("jax_platforms", "cpu")

    from handwritten_ocr_tpu.parallel import distributed

    assert distributed.initialize_from_env() is True
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.qwen3 import (Qwen3Config, Qwen3Model,
                                                  lm_logits, text_forward)

    cfg = Qwen3Config(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=4, head_dim=16, eos_token_id=0)
    # Same seed in every process -> same host param values; each process
    # contributes only the shards its local devices own.
    params = init_qwen3(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    params_host = jax.tree_util.tree_map(np.asarray, params)
    ids = np.arange(1, 8 * 12 + 1, dtype=np.int32).reshape(8, 12) % 512

    # Single-process reference on this process's local default device.
    ref = np.asarray(Qwen3Model(params, cfg).forward_logits(ids), np.float32)

    mesh = distributed.global_mesh(model_parallel=2)
    placed = distributed.replicate_params(mesh, params_host)
    batch = distributed.shard_host_batch(
        mesh, lambda idx: ids[idx], ids.shape)

    @jax.jit
    def read_forward(p, token_ids):
        embeds = p["embed"]["w"][token_ids]
        positions = jnp.broadcast_to(
            jnp.arange(token_ids.shape[1])[None], token_ids.shape)
        hidden, _ = text_forward(p, cfg, embeds, positions, None)
        logits = lm_logits(p, cfg, hidden)
        return jax.lax.with_sharding_constraint(
            logits, NamedSharding(mesh, P()))

    with mesh:
        got = np.asarray(read_forward(placed, batch), np.float32)

    result = {
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "process_count": jax.process_count(),
        "is_coordinator": distributed.is_coordinator(),
        "max_abs_err": float(np.abs(got - ref).max()),
    }
    Path(os.environ["HOCR_DIST_CHILD_OUT"]).write_text(json.dumps(result))


if __name__ == "__main__":
    if "--dist-child" in sys.argv:
        _dist_child()
