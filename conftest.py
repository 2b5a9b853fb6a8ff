"""Root pytest config: import path + virtual multi-device CPU mesh.

Sharding tests run on an 8-device virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), so multi-chip code paths are
exercised without TPU hardware. Flags must be set before jax initializes.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
