"""Host-side pipeline graph: nodes, routing, and the driver loop.

Replaces the reference's LangGraph state machine (graph.py:49-79) with a
dependency-free driver: identical node set, edges, routing precedence, and
terminal semantics. Control flow stays on host; tensors stay on device.
"""

from handwritten_ocr_tpu.graph.routing import route_after_critic, route_after_reocr
from handwritten_ocr_tpu.graph.driver import OCRPipeline

__all__ = ["route_after_critic", "route_after_reocr", "OCRPipeline"]
