"""Command-line entry points: ``ocr`` (transcribe) and ``eval_final``."""
