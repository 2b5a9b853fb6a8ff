"""Backend protocols for the two model engines and the preprocessor."""

from __future__ import annotations

import dataclasses
from typing import Any, Protocol, Sequence, runtime_checkable


@dataclasses.dataclass
class PreparedImage:
    """A preprocessed page ready for the OCR engine.

    ``data`` is backend-defined: a device array for the JAX engine, a file
    path for client backends, an opaque token for test fakes.
    """

    data: Any
    strategy_label: str
    source_path: str


@runtime_checkable
class Preprocessor(Protocol):
    """Applies a preprocessing strategy chain to a page image."""

    def apply(self, image_path: str, strategy: str | Sequence[str]) -> PreparedImage:
        """Run the transform chain; returns the prepared image."""
        ...


@runtime_checkable
class OCRBackend(Protocol):
    """A vision-language OCR engine.

    The TPU engine reads *batches* — N preprocessed variants of one page (or
    pages of a folder) execute as one batched forward (SURVEY.md §2.2) — so
    the batched call is primary and the single read is the B=1 case.
    """

    def read_batch(self, images: Sequence, prompt: str, max_new_tokens: int) -> list[str]:
        """OCR every image; returns one transcription per image."""
        ...

    def read(self, image, prompt: str, max_new_tokens: int) -> str:
        """OCR a single image (B=1 convenience wrapper)."""
        ...

    def release(self) -> None:
        """Free engine memory.

        API-parity hook for the reference's unload_ocr_model
        (tools.py:714-725). On TPU both engines stay HBM-resident, so the
        default implementations are no-ops.
        """
        ...
