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


def __getattr__(name):
    """Lazy top-level API (keeps `import handwritten_ocr_tpu` light)."""
    from importlib import import_module

    exports = {
        "OCRPipeline": "handwritten_ocr_tpu.graph",
        "LockstepPipeline": "handwritten_ocr_tpu.graph.batch_driver",
        "RunConfig": "handwritten_ocr_tpu.config",
        "OCRState": "handwritten_ocr_tpu.state",
        "initial_state": "handwritten_ocr_tpu.state",
        "Trace": "handwritten_ocr_tpu.trace",
        "evaluate": "handwritten_ocr_tpu.evaluation",
        "build_jax_pipeline": "handwritten_ocr_tpu.engine.jax_engines",
        "normalize_text": "handwritten_ocr_tpu.text",
        "levenshtein": "handwritten_ocr_tpu.text",
        "cer": "handwritten_ocr_tpu.text",
        "wer": "handwritten_ocr_tpu.text",
        "tier1_metrics": "handwritten_ocr_tpu.text",
        "compare_versions": "handwritten_ocr_tpu.text",
        "merge_versions": "handwritten_ocr_tpu.text",
        "parse_ground_truth": "handwritten_ocr_tpu.text",
    }
    if name in exports:
        return getattr(import_module(exports[name]), name)
    raise AttributeError(f"module 'handwritten_ocr_tpu' has no attribute {name!r}")
