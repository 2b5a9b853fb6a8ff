"""HF transformers (torch) OCR backend — parity mode.

Replicates the reference's OCR engine wrapper behavior (tools.py:676-771):
lazy cached model load with min/max pixel processor budgets, chat-template
inference, decode of only the new tokens, and a real ``release`` that frees
the model (the reference's unload_ocr_model contract). Used by
``ocr --backend ollama`` for A/B parity testing against the reference
setup; the TPU path uses :mod:`jax_engines` instead.
"""

from __future__ import annotations

import gc
from pathlib import Path
from typing import Sequence

from handwritten_ocr_tpu import config


class HFTorchOCRBackend:
    """olmOCR-2 via HF transformers + torch (cpu/cuda/mps auto-pick)."""

    def __init__(self, model_id: str = config.OLMOCR_MODEL,
                 min_pixels: int = config.OCR_MIN_PIXELS,
                 max_pixels: int = config.OCR_MAX_PIXELS):
        self.model_id = model_id
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self._model = None
        self._processor = None

    def _load(self):
        if self._model is not None:
            return self._model, self._processor
        import torch
        from transformers import AutoModelForImageTextToText, AutoProcessor

        if torch.backends.mps.is_available():
            device = "mps"
        elif torch.cuda.is_available():
            device = "cuda"
        else:
            device = "cpu"
        print(f"  [ocr] Loading {self.model_id} on {device}...")
        self._processor = AutoProcessor.from_pretrained(
            self.model_id, min_pixels=self.min_pixels,
            max_pixels=self.max_pixels)
        self._model = AutoModelForImageTextToText.from_pretrained(
            self.model_id, torch_dtype=torch.bfloat16, device_map=device)
        return self._model, self._processor

    def read(self, image, prompt: str, max_new_tokens: int) -> str:
        import torch

        image_path = getattr(image, "data", image)
        model, processor = self._load()
        messages = [{
            "role": "user",
            "content": [
                {"type": "image", "url": str(image_path)},
                {"type": "text", "text": prompt},
            ],
        }]
        device = next(model.parameters()).device
        inputs = processor.apply_chat_template(
            messages, add_generation_prompt=True, tokenize=True,
            return_dict=True, return_tensors="pt").to(device)
        with torch.no_grad():
            output = model.generate(**inputs, max_new_tokens=max_new_tokens)
        return processor.decode(
            output[0][inputs["input_ids"].shape[-1]:], skip_special_tokens=True)

    def read_batch(self, images: Sequence, prompt: str,
                   max_new_tokens: int) -> list[str]:
        return [self.read(img, prompt, max_new_tokens) for img in images]

    def release(self) -> None:
        """Free model memory (the reference's unload contract)."""
        if self._model is None:
            return
        self._model = None
        self._processor = None
        gc.collect()
        try:
            import torch
            if torch.backends.mps.is_available():  # pragma: no cover
                torch.mps.empty_cache()
        except ImportError:  # pragma: no cover
            pass
        print("  [ocr] Model unloaded, memory freed.")


class FilePreprocessor:
    """Reference-style preprocessing to temp files for path-based backends.

    Applies the same device transform bank but materializes the result as
    an image file (tools.py:633-673 contract: ``ocr_<label>_*`` temp name),
    since torch/HTTP backends consume paths.
    """

    def apply(self, image_path: str, strategy):
        import tempfile

        import numpy as np
        from PIL import Image
        import jax.numpy as jnp

        from handwritten_ocr_tpu.engine.protocols import PreparedImage
        from handwritten_ocr_tpu.graph.driver import strategy_label
        from handwritten_ocr_tpu.models.processor import load_image_rgb
        from handwritten_ocr_tpu.ops.bank import preprocess_chain

        label = strategy_label(strategy)
        steps = [strategy] if isinstance(strategy, str) else list(strategy)
        if steps in ([], ["original"]):
            return PreparedImage(data=image_path, strategy_label=label,
                                 source_path=image_path)
        processed = preprocess_chain(jnp.asarray(load_image_rgb(image_path)),
                                     strategy)
        suffix = Path(image_path).suffix or ".png"
        tmp = tempfile.NamedTemporaryFile(
            suffix=suffix, delete=False, prefix=f"ocr_{label}_")
        Image.fromarray(np.asarray(processed)).save(tmp.name)
        return PreparedImage(data=tmp.name, strategy_label=label,
                             source_path=image_path)
