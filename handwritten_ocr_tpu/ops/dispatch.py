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

    Default "auto" since round 3: XLA's inline int8 widening wins for
    layer-stack projections (measured 88% of the HBM floor over a
    VMEM-defeating 4-layer loop vs 82% for the kernel), but the kernel
    wins on VMEM-exceeding giants — the 520 MB lm_head streams at 91%
    vs XLA's 76% (−140 us/step at batch 24). "auto" applies the kernel
    only above ``INT8_KERNEL_AUTO_BYTES``. HOCR_TPU_INT8=1 forces it
    everywhere, =0 disables."""
    import os
    if os.environ.get("HOCR_TPU_INT8") in ("1", "on", "true", "compiled"):
        return "compiled" if jax.default_backend() == "tpu" else "off"
    env_mode = _mode("HOCR_TPU_INT8")
    return "auto" if env_mode == "compiled" else env_mode


# "auto" threshold: weights comfortably beyond VMEM capacity (128 MB on
# v5e), where XLA cannot park the buffer on-chip and the kernel's
# pipelined HBM streaming wins. In practice this selects the lm_head.
INT8_KERNEL_AUTO_BYTES = 256 * 2**20


def window_attention_mode() -> str:
    """Dispatch mode for the fused multi-window vision attention kernel
    (ops/window_attention): block-diagonal chunks of whole windows per
    grid step, rope in-kernel, scores never materialized in HBM.
    ``HOCR_TPU_WINATTN=interpret`` runs it through the Pallas interpreter
    on CPU (parity tests); ``=0`` forces the jnp einsum path."""
    return _mode("HOCR_TPU_WINATTN")


def window_attention_layout() -> str:
    """Block layout for the window kernel: "packed" (default — one
    full-width [rows, 3D] qkv block per grid step, heads sliced on lane
    offsets in-kernel; measured 5.9 vs 7.2 ms/layer against the per-head
    fold layout at the bench grid, the fold/unfold HBM transposes gone)
    or "fold" via ``HOCR_TPU_WINATTN_LAYOUT=fold``."""
    env = os.environ.get("HOCR_TPU_WINATTN_LAYOUT", "").lower()
    return "fold" if env == "fold" else "packed"


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
