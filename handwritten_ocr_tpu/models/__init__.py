"""First-party JAX model implementations.

The two engines of the pipeline (SURVEY.md §1 L0), rebuilt TPU-native:
  * :mod:`qwen25vl` — Qwen2.5-VL-family vision-language model (the olmOCR-2
    OCR engine architecture): dynamic-resolution windowed ViT + M-RoPE
    decoder.
  * :mod:`qwen3` — Qwen3 text decoder (the critic/editor/arbitrator
    reasoning engine architecture) with per-head QK-norm.

Everything is functional JAX: parameters are nested dict pytrees, forwards
are pure functions, sharding is applied externally via NamedSharding specs
from :mod:`handwritten_ocr_tpu.parallel`.
"""
