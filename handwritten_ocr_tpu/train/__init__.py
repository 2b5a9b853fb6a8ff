"""Training: fine-tuning step for the VLM over a sharded mesh.

New capability beyond the reference (which is inference-only): a jittable
full training step — vision encode + splice + decoder forward, next-token
cross-entropy on response tokens, adamw update — with DP/TP(/FSDP)
shardings from :mod:`handwritten_ocr_tpu.parallel`.
"""

from handwritten_ocr_tpu.train.step import TrainBatch, make_train_step, vl_forward

__all__ = ["TrainBatch", "make_train_step", "vl_forward"]
