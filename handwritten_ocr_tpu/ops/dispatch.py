"""Kernel dispatch policy: Pallas fast paths vs portable jnp fallbacks.

The Pallas flash-attention kernel runs compiled on TPU; on CPU backends
(tests, dev boxes) the jnp reference path is used unless
``HOCR_TPU_FLASH=interpret`` forces the kernel through the Pallas
interpreter (integration-parity testing). ``HOCR_TPU_FLASH=0`` disables
the kernel everywhere.
"""

from __future__ import annotations

import os

import jax


def flash_mode() -> str:
    """"compiled" | "interpret" | "off" for the current backend/env."""
    return _mode("HOCR_TPU_FLASH")


def int8_kernel_mode() -> str:
    """Dispatch mode for the Pallas int8 weight matmul (decode path)."""
    return _mode("HOCR_TPU_INT8")


def _mode(env_name: str) -> str:
    env = os.environ.get(env_name, "").lower()
    if env in ("0", "off", "false"):
        return "off"
    if env == "interpret":
        return "interpret"
    return "compiled" if jax.default_backend() == "tpu" else "off"
