"""Root pytest config: import path + virtual multi-device CPU mesh.

Tests run on CPU with an 8-device virtual mesh
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding code
paths are exercised without TPU hardware. The axon TPU plugin registers
itself from sitecustomize regardless of ``JAX_PLATFORMS``, so the platform
must be forced through ``jax.config`` (which wins over the plugin), and the
XLA flag must be set before the backend initializes.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (must import after env setup)

jax.config.update("jax_platforms", "cpu")
