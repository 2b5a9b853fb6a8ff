#!/usr/bin/env python3
"""Pre-convert an HF snapshot into a native framework checkpoint.

Transposes weights into the framework layout (and optionally quantizes to
weight-only int8) once, offline, so engine startup is a fast orbax restore
instead of a full safetensors conversion pass.

Usage:
    python scripts/convert_checkpoint.py vl /path/to/olmOCR-snapshot out_dir --quantize int8
    python scripts/convert_checkpoint.py qwen3 /path/to/qwen3-snapshot out_dir
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Honor JAX_PLATFORMS explicitly (the axon TPU plugin ignores the env var);
# conversion is pure host work and runs fine on CPU.
_platform = os.environ.get("JAX_PLATFORMS", "")
if _platform and "axon" not in _platform:
    import jax
    jax.config.update("jax_platforms", _platform.split(",")[0])


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("family", choices=["vl", "qwen3"])
    parser.add_argument("src", type=Path, help="HF snapshot directory")
    parser.add_argument("dst", type=Path, help="output checkpoint directory")
    parser.add_argument("--quantize", choices=["int8"], default=None)
    parser.add_argument("--dtype", choices=["bfloat16", "float32"],
                        default="bfloat16")
    args = parser.parse_args()

    import jax.numpy as jnp
    from handwritten_ocr_tpu.models.checkpoint import save_checkpoint

    dtype = getattr(jnp, args.dtype)
    hf_config = json.loads((args.src / "config.json").read_text())

    if args.family == "vl":
        from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig
        from handwritten_ocr_tpu.models.weights import convert_vl
        config = VLConfig.from_hf(hf_config)
        params = convert_vl(args.src, config, dtype=dtype)
    else:
        from handwritten_ocr_tpu.models.qwen3 import Qwen3Config
        from handwritten_ocr_tpu.models.weights import convert_qwen3
        config = Qwen3Config.from_hf(hf_config)
        params = convert_qwen3(args.src, config, dtype=dtype)

    if args.quantize == "int8":
        from handwritten_ocr_tpu.models.quant import quantize_tree
        params = quantize_tree(params)

    meta = {
        "family": args.family,
        "hf_config": hf_config,
        "dtype": args.dtype,
        "quantize": args.quantize,
        "source": str(args.src),
    }
    save_checkpoint(args.dst, params, meta)

    # Carry config + tokenizer files so the checkpoint dir is self-contained.
    import shutil
    for name in ("config.json", "tokenizer.json", "tokenizer_config.json",
                 "vocab.json", "merges.txt", "special_tokens_map.json",
                 "generation_config.json", "preprocessor_config.json"):
        src_file = args.src / name
        if src_file.exists():
            shutil.copy(src_file, args.dst / name)
    from handwritten_ocr_tpu.models.quant import quantized_bytes
    print(f"Saved {args.family} checkpoint to {args.dst} "
          f"({quantized_bytes(params) / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()
