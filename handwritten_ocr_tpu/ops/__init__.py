"""Image preprocessing ops: the TPU-native transform bank.

Re-implements the reference's OpenCV transform bank (tools.py:496-630) as
JAX ops over device-resident images — no temp files, no host round-trips;
chains compile into one fused XLA program per strategy
(:func:`handwritten_ocr_tpu.ops.bank.preprocess_chain`).

Transforms (reference parameter contracts in each module):
  high_contrast — CLAHE clip 3.0, 8x8 tiles              (ops.clahe)
  binarize      — adaptive Gaussian threshold 21/C=10    (ops.threshold)
  sharpen       — 5-point kernel filter2D                (ops.sharpen)
  deskew        — minAreaRect angle + bicubic warp       (ops.geometry)
  denoise       — non-local means h=10, 7/21             (ops.denoise)
  remove_lines  — morphology line mask + inpaint         (ops.lines)
"""

from handwritten_ocr_tpu.ops.bank import TRANSFORMS, preprocess_chain
from handwritten_ocr_tpu.ops.gray import rgb_to_gray

__all__ = ["TRANSFORMS", "preprocess_chain", "rgb_to_gray"]
