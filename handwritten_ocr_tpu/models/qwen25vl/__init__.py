"""Qwen2.5-VL-family vision-language model in JAX (the OCR engine).

Architecture per the public Qwen2.5-VL design (olmOCR-2-7B is this family):
dynamic-resolution windowed ViT with 2D rotary embeddings and a 2x2 patch
merger, feeding an M-RoPE GQA decoder. Re-designed TPU-first: N strategy
variants of one page run as a single batched forward over identical grids
(static shapes, MXU-friendly), with a preallocated KV cache for decode.
"""

from handwritten_ocr_tpu.models.qwen25vl.config import (
    VisionConfig,
    TextConfig,
    VLConfig,
)
from handwritten_ocr_tpu.models.qwen25vl.vision import vision_encode
from handwritten_ocr_tpu.models.qwen25vl.language import text_forward
from handwritten_ocr_tpu.models.qwen25vl.model import VLModel

__all__ = [
    "VisionConfig", "TextConfig", "VLConfig",
    "vision_encode", "text_forward", "VLModel",
]
