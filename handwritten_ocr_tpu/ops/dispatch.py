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
    """Dispatch mode for the Pallas int8 weight matmul.

    Default OFF since round 2: inside the paged serving while_loop, XLA
    reads the int8 buffer and widens inline without materializing a bf16
    copy (measured: whole 7B step 14.5 ms < the 17.7 ms bf16-weight
    floor), and the Pallas kernel costs +1.4 ms/step at batch 8 vs that
    fused path. Set HOCR_TPU_INT8=1 to re-enable (round 1's contiguous
    decode loop benefited)."""
    import os
    if os.environ.get("HOCR_TPU_INT8") in ("1", "on", "true", "compiled"):
        return "compiled" if jax.default_backend() == "tpu" else "off"
    env_mode = _mode("HOCR_TPU_INT8")
    return "off" if env_mode == "compiled" else env_mode


def paged_attention_mode() -> str:
    """Dispatch mode for the fused append+attention decode kernel
    (ops/paged_decode_attention): appends the step's k/v into the pool
    by in-kernel DMA and reads only the length-bounded pages of each
    slot — no XLA scatter, no gathered window copy.
    ``HOCR_TPU_PAGED=interpret`` runs it through the Pallas interpreter
    on CPU (parity tests); by default CPU uses the jnp gather fallback."""
    return _mode("HOCR_TPU_PAGED")


def _mode(env_name: str) -> str:
    env = os.environ.get(env_name, "").lower()
    if env in ("0", "off", "false"):
        return "off"
    if env == "interpret":
        return "interpret"
    return "compiled" if jax.default_backend() == "tpu" else "off"
