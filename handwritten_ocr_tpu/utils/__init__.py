"""Shared utilities: robust JSON extraction, misc IO helpers."""

from handwritten_ocr_tpu.utils.jsonio import extract_json

__all__ = ["extract_json"]
