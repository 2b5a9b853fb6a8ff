"""handwritten_ocr_tpu — a TPU-native agentic OCR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``marwanbounassif/handwritten-ocr`` pipeline (an agentic handwritten-notes OCR
system): a vision-language OCR model reads multiple image preprocessings of a
page, and an LLM critic/editor/arbitrator loop refines the transcription until
acceptance, plateau, or budget exhaustion.

Design differences from the reference (see SURVEY.md):
  * All image preprocessing runs as fused JAX/Pallas kernels on HBM-resident
    page batches instead of OpenCV + temp files.
  * The OCR VLM (Qwen2.5-VL family) and the reasoning LLM (Qwen3 family) are
    first-party JAX implementations with paged KV caches; both stay resident
    in HBM (no load/unload thrash), sharded over a device mesh when needed.
  * Multi-strategy reads of one page execute as a single batched forward;
    batch-folder workloads shard pages across chips with XLA collectives only
    at the merge step.
  * The LangGraph state machine is a dependency-free host-side driver with
    identical states, edges, and routing precedence.
"""

__version__ = "0.1.0"
