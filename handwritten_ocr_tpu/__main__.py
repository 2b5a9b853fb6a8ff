"""``python -m handwritten_ocr_tpu`` ≡ the ``ocr`` console script."""

from handwritten_ocr_tpu.cli.transcribe import main

main()
