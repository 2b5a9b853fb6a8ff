#!/usr/bin/env python3
"""One-time CPU reference baseline for bench.py's vs_baseline ratio.

Replicates the reference execution model (SURVEY.md §3.1) on CPU: cv2
preprocessing per page, then a *sequential* HF torch ``generate`` per page
(the reference batches nothing), with the same 3B-class architecture and
decode budget as bench.py's TPU workload.

A full 160-token page decode takes many minutes on this 1-core host, so
the page cost is assembled from measured parts:
  cost(page) = preprocess + prefill(full prompt) + decode_tokens · t(step)
with prefill measured once at the real prompt length and the per-step
decode cost measured over a short run. Writes bench_baseline.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main() -> None:
    import os

    import cv2
    import torch
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from bench import build_config, synthetic_pages

    torch.set_num_threads(max(torch.get_num_threads(), 1))

    scale = os.environ.get("HOCR_BENCH_SCALE", "3b")
    cfg = build_config(scale)
    hf_cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size, hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            rope_scaling={"type": "mrope",
                          "mrope_section": list(cfg.text.mrope_section)},
            tie_word_embeddings=False,
        ),
        vision_config=dict(
            depth=cfg.vision.depth, hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_heads=cfg.vision.num_heads,
            out_hidden_size=cfg.vision.out_hidden_size,
            fullatt_block_indexes=list(cfg.vision.fullatt_block_indexes),
        ),
    )
    print(f"instantiating {scale} torch model (random weights)...", flush=True)
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()

    page = synthetic_pages(1)[0]

    # 1. reference-style cv2 preprocessing (high_contrast + binarize).
    t0 = time.perf_counter()
    gray = cv2.cvtColor(page, cv2.COLOR_RGB2GRAY)
    clahe = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(gray)
    processed = cv2.adaptiveThreshold(clahe, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C,
                                      cv2.THRESH_BINARY, 21, 10)
    preprocess_s = time.perf_counter() - t0
    print(f"preprocess: {preprocess_s:.3f}s", flush=True)

    # 2. pack patches + prompt exactly as bench.py does.
    from handwritten_ocr_tpu.models.processor import pack_image
    packed = pack_image(np.stack([processed] * 3, axis=-1))
    n_img = packed.num_llm_tokens
    head = [151644, 872, 198, 151652]
    tail = [151653] + list(range(100, 130)) + [151645, 198, 151644, 77091, 198]
    ids = torch.tensor([head + [151655] * n_img + tail])
    pixel_values = torch.tensor(packed.patches)
    grid = torch.tensor([list(packed.grid)])

    # 3. warm-up forward first: oneDNN packs weights on the first pass,
    # which would otherwise inflate the measured prefill ~2x.
    from transformers import DynamicCache

    with torch.no_grad():
        model(input_ids=ids, pixel_values=pixel_values, image_grid_thw=grid,
              use_cache=True, past_key_values=DynamicCache(config=model.config))
    print("warm-up forward done", flush=True)

    with torch.no_grad():
        t0 = time.perf_counter()
        out = model(input_ids=ids, pixel_values=pixel_values,
                    image_grid_thw=grid, use_cache=True,
                    past_key_values=DynamicCache(config=model.config))
        prefill_s = time.perf_counter() - t0
    print(f"prefill ({ids.shape[1]} tokens): {prefill_s:.1f}s", flush=True)

    # 4. decode steps against the prebuilt cache (pure per-token cost).
    cache = out.past_key_values
    next_tok = out.logits[:, -1:].argmax(-1)
    n_steps = 8
    with torch.no_grad():
        t0 = time.perf_counter()
        for offset in range(n_steps):
            pos = ids.shape[1] + offset
            step_out = model(
                input_ids=next_tok, past_key_values=cache, use_cache=True,
                cache_position=torch.tensor([pos]))
            next_tok = step_out.logits[:, -1:].argmax(-1)
            cache = step_out.past_key_values
        step_s = (time.perf_counter() - t0) / n_steps
    print(f"decode: {step_s:.2f}s/token", flush=True)

    decode_tokens = 160
    page_s = preprocess_s + prefill_s + decode_tokens * step_s
    cpu_pages_per_sec = 1.0 / page_s

    result = {
        "cpu_pages_per_sec": round(cpu_pages_per_sec, 6),
        "method": "torch CPU, sequential per page (reference execution "
                  "model): cv2 preprocess + measured prefill + "
                  f"{decode_tokens} tokens x measured decode step",
        "components_s": {
            "preprocess": round(preprocess_s, 3),
            "prefill": round(prefill_s, 2),
            "decode_per_token": round(step_s, 3),
            "page_total": round(page_s, 2),
        },
        "prompt_tokens": int(ids.shape[1]),
        "host": "1-core CPU (this machine)",
    }
    out_path = Path(__file__).parent.parent / "bench_baseline.json"
    existing = {}
    if out_path.exists():
        existing = json.loads(out_path.read_text())
        if "cpu_pages_per_sec" in existing:   # legacy flat layout
            existing = {"3b": existing}
    existing[scale] = result
    out_path.write_text(json.dumps(existing, indent=2) + "\n")
    print(json.dumps({scale: result}))


if __name__ == "__main__":
    main()
