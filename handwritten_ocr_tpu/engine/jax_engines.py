"""On-device JAX engines: the TPU-native OCR and reasoning backends.

Both engines stay HBM-resident for the whole run — the reference's
load/unload thrash (tools.py:714-725) disappears; ``release()`` is a no-op
kept for API parity. Multi-strategy reads of one page share one batched
vision+prefill+decode program (identical grids by construction, since every
transform preserves the page geometry).

Checkpoint discovery: ``HOCR_OLMOCR_DIR`` / ``HOCR_QWEN3_DIR`` environment
variables point at local HF snapshots (config.json + *.safetensors +
tokenizer files).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu import config as cfg_mod
from handwritten_ocr_tpu.engine.protocols import PreparedImage
from handwritten_ocr_tpu.graph.driver import OCRPipeline, strategy_label
from handwritten_ocr_tpu.models.processor import (
    HFTokenizer,
    TextTokenizer,
    llm_chat_prompt,
    load_image_rgb,
    pack_image,
    vlm_chat_prompt,
)

OLMOCR_DIR_ENV = "HOCR_OLMOCR_DIR"
QWEN3_DIR_ENV = "HOCR_QWEN3_DIR"


def _spec_enabled() -> bool:
    """Prompt-lookup speculative decoding toggle (HOCR_SPEC=1 enables).

    Default OFF (round-5 decision): every LIVE measurement of the net
    effect on this stack is <= 1.03x — trained-tiny copy workload 0.72x
    at 53.6% acceptance (BENCH_DETAIL speculation_trained), 8B-class
    teacher-forced curve 0.996-1.03x across 0-19% acceptance
    (spec_scale_ab.json) — because verify rounds pay a full weight read
    while non-drafting slots advance one token. The machinery stays
    (greedy-invariant, bit-tested); enable for genuinely copy-heavy
    serving mixes where drafting slots dominate the batch. Explicit
    allowlist so a set-but-empty HOCR_SPEC stays off."""
    return os.environ.get("HOCR_SPEC", "0") in ("1", "on", "true")


def _kv_quant() -> bool:
    """int8 KV cache on the TPU serving path (config.SERVE_KV_INT8;
    HOCR_KV_INT8=0 overrides off). CPU keeps the full-precision cache so
    portable tests stay bit-comparable to the dense decoder."""
    if os.environ.get("HOCR_KV_INT8", "") in ("0", "off", "false"):
        return False
    return cfg_mod.SERVE_KV_INT8 and jax.default_backend() == "tpu"


class TPUPreprocessor:
    """Runs strategy chains on device; images never touch temp files.

    The page is resized to its smart-resize target at load time (host PIL
    bicubic, HF-processor-exact), so every downstream stage — transform
    chain, patch packing, vision encode — stays on device with static
    28-aligned shapes and zero host round-trips.
    """

    def __init__(self, min_pixels: int = cfg_mod.OCR_MIN_PIXELS,
                 max_pixels: int = cfg_mod.OCR_MAX_PIXELS):
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self._cache: dict[str, jnp.ndarray] = {}

    def _load_aligned(self, image_path: str) -> jnp.ndarray:
        from handwritten_ocr_tpu.models.processor import (
            aligned_smart_size, resize_bicubic)
        cached = self._cache.get(image_path)
        if cached is not None:
            return cached
        image = load_image_rgb(image_path)
        target = aligned_smart_size(image.shape[0], image.shape[1],
                                    min_pixels=self.min_pixels,
                                    max_pixels=self.max_pixels)
        if target != image.shape[:2]:
            image = resize_bicubic(image, target)
        device_image = jnp.asarray(image)
        self._cache = {image_path: device_image}  # one page at a time
        return device_image

    def apply(self, image_path: str, strategy) -> PreparedImage:
        from handwritten_ocr_tpu.ops.bank import preprocess_chain
        processed = preprocess_chain(self._load_aligned(image_path), strategy)
        return PreparedImage(data=processed,
                             strategy_label=strategy_label(strategy),
                             source_path=image_path)


class JaxOCRBackend:
    """Batched VLM OCR over preprocessed device images.

    With :meth:`shard`, the engine runs multi-chip: model parameters get
    Megatron-style tensor parallelism over the mesh's "model" axis and the
    page batch is split over "data" — GSPMD inserts the collectives; the
    batched read path is unchanged (BASELINE config #5: batch folders
    sharded across chips).
    """

    def __init__(self, model, tokenizer: TextTokenizer,
                 min_pixels: int = cfg_mod.OCR_MIN_PIXELS,
                 max_pixels: int = cfg_mod.OCR_MAX_PIXELS,
                 serving: str | None = None):
        self.model = model
        self.tokenizer = tokenizer
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.mesh = None
        # "paged" (default): continuous batching over the paged KV cache —
        # pages that hit EOS release their blocks/slot mid-batch and decode
        # slots are shared across grid groups. "dense": contiguous
        # per-batch cache (the A/B reference path).
        self.serving = serving or os.environ.get("HOCR_VL_SERVING", "paged")
        self._batcher = None

    def shard(self, mesh, fsdp: bool = False) -> "JaxOCRBackend":
        """Place model params on ``mesh`` (TP over "model", opt. FSDP)."""
        from handwritten_ocr_tpu.parallel.sharding import shard_params
        self.model.params = shard_params(mesh, self.model.params, fsdp=fsdp)
        self.mesh = mesh
        self._batcher = None                 # rebuild against sharded params
        return self

    def _ensure_batcher(self, needed_context: int):
        """(Re)build the serving batcher when the context bound grows.

        The context bound rounds up to a power of two (floor 512): every
        distinct bound compiles a fresh program set, so fine-grained
        bounds would recompile on nearly every prompt-length change,
        while the table-width ladder already keeps attention reads
        length-bounded inside an oversized table — the only cost of
        rounding up is pool capacity."""
        from handwritten_ocr_tpu.engine.serving import (
            ContinuousBatcher, PagedProgram)
        block = cfg_mod.SERVE_BLOCK_SIZE
        context = 512
        while context < needed_context:
            context *= 2
        if self._batcher is None or self._batcher.max_context < context:
            config = self.model.config
            program = PagedProgram(self.model.params["text"], config.text,
                                   eos_token_id=config.eos_token_id,
                                   mesh=self.mesh)
            self._batcher = ContinuousBatcher(
                program, n_slots=cfg_mod.SERVE_SLOTS, block_size=block,
                max_context=context, chunk=cfg_mod.SERVE_CHUNK,
                throughput_chunk=cfg_mod.SERVE_THROUGHPUT_CHUNK,
                prefill_bucket=cfg_mod.SERVE_PREFILL_BUCKET,
                dtype=self.model.params["text"]["embed"]["w"].dtype,
                kv_quant=_kv_quant())
        return self._batcher

    def _place_batch(self, patches):
        """Shard the page batch over the mesh's "data" axis when sharded."""
        if self.mesh is None:
            return patches
        from handwritten_ocr_tpu.parallel.sharding import data_sharding
        data_size = self.mesh.shape["data"]
        batch = patches.shape[0]
        if batch % data_size:
            return patches  # ragged remainder: replicate rather than fail
        return jax.device_put(patches, data_sharding(self.mesh, patches.ndim))

    @classmethod
    def from_pretrained(cls, model_dir: str | Path, dtype=jnp.bfloat16,
                        quantize: str | None = None) -> "JaxOCRBackend":
        from handwritten_ocr_tpu.models.qwen25vl.config import VLConfig
        from handwritten_ocr_tpu.models.qwen25vl.model import VLModel
        model_dir = Path(model_dir)
        if (model_dir / "meta.json").exists():  # native pre-converted ckpt
            from handwritten_ocr_tpu.models.checkpoint import load_checkpoint
            params, meta = load_checkpoint(model_dir)
            config = VLConfig.from_hf(meta["hf_config"])
        else:
            from handwritten_ocr_tpu.models.weights import convert_vl
            config = VLConfig.from_pretrained_dir(model_dir)
            params = convert_vl(model_dir, config, dtype=dtype)
        if quantize == "int8":
            from handwritten_ocr_tpu.models.quant import quantize_tree
            params = quantize_tree(params)
        return cls(VLModel(params, config), HFTokenizer(model_dir))

    def _prompt_ids(self, prompt: str, n_image_tokens: int) -> np.ndarray:
        config = self.model.config
        text = vlm_chat_prompt(prompt, num_image_tokens=1)
        # Tokenize with a single placeholder, then expand to the real count
        # (avoids quadratic tokenizer work on thousands of pads).
        ids = self.tokenizer.encode(text)
        out: list[int] = []
        for tok in ids:
            if tok == config.image_token_id:
                out.extend([config.image_token_id] * n_image_tokens)
            else:
                out.append(tok)
        return np.array(out, dtype=np.int32)

    def _pack_one(self, data):
        """(patches, grid): on-device when possible, host fallback else."""
        from handwritten_ocr_tpu.models.processor import pack_image_device
        if isinstance(data, jnp.ndarray) and data.ndim in (2, 3) \
                and data.shape[0] % 28 == 0 and data.shape[1] % 28 == 0:
            patches, grid = pack_image_device(data)
            return patches, grid
        packed = pack_image(np.asarray(data), min_pixels=self.min_pixels,
                            max_pixels=self.max_pixels)
        return jnp.asarray(packed.patches), packed.grid

    def _grid_groups(self, images: Sequence):
        """Pack images and group identical grids (all strategies of one
        page share a grid; mixed-page batches fall into grid groups)."""
        packed = [self._pack_one(getattr(img, "data", img)) for img in images]
        order = sorted(range(len(packed)), key=lambda i: packed[i][1])
        start = 0
        while start < len(order):
            end = start
            grid = packed[order[start]][1]
            while end < len(order) and packed[order[end]][1] == grid:
                end += 1
            group = order[start:end]
            patches = self._place_batch(
                jnp.stack([packed[i][0] for i in group]))
            yield group, grid, patches
            start = end

    def read_batch(self, images: Sequence, prompt: str,
                   max_new_tokens: int) -> list[str]:
        if self.serving == "paged":
            return self._read_batch_paged(images, prompt, max_new_tokens)
        return self._read_batch_dense(images, prompt, max_new_tokens)

    def _read_batch_dense(self, images: Sequence, prompt: str,
                          max_new_tokens: int) -> list[str]:
        """Contiguous-cache path: one batched generate per grid group."""
        results: list[str | None] = [None] * len(images)
        for group, grid, patches in self._grid_groups(images):
            n_llm_tokens = grid[0] * grid[1] * grid[2] // 4
            ids_row = self._prompt_ids(prompt, n_llm_tokens)
            input_ids = np.tile(ids_row, (len(group), 1))
            if self.mesh is not None:
                with self.mesh:
                    gen = self.model.generate(input_ids, patches, grid,
                                              max_new_tokens)
            else:
                gen = self.model.generate(input_ids, patches, grid,
                                          max_new_tokens)
            tokens = np.asarray(gen.tokens)
            lengths = np.asarray(gen.lengths)
            for row, img_idx in enumerate(group):
                results[img_idx] = self.tokenizer.decode(
                    tokens[row, : lengths[row]].tolist())
        return results  # type: ignore[return-value]

    def _read_batch_paged(self, images: Sequence, prompt: str,
                          max_new_tokens: int) -> list[str]:
        """Serving path: vision encode + splice per grid group, then ALL
        pages decode together through the continuous batcher — slots are
        shared across grid groups and a page that finishes early frees its
        KV blocks for queued pages immediately."""
        from handwritten_ocr_tpu.engine.serving import GenRequest
        from handwritten_ocr_tpu.models.qwen25vl.model import (
            rope_index_for_prompt)

        requests: list[GenRequest | None] = [None] * len(images)
        longest = 0
        for group, grid, patches in self._grid_groups(images):
            n_llm_tokens = grid[0] * grid[1] * grid[2] // 4
            ids_row = self._prompt_ids(prompt, n_llm_tokens)
            positions, delta = rope_index_for_prompt(
                ids_row, self.model.config, [grid])
            input_ids = jnp.asarray(np.tile(ids_row, (len(group), 1)))
            if self.mesh is not None:
                with self.mesh:
                    embeds = self.model.prompt_embeds(
                        self.model.params, input_ids, patches, grid)
            else:
                embeds = self.model.prompt_embeds(
                    self.model.params, input_ids, patches, grid)
            longest = max(longest, len(ids_row))
            for row, img_idx in enumerate(group):
                requests[img_idx] = GenRequest(
                    prompt_ids=ids_row, max_new=max_new_tokens,
                    positions=positions, rope_delta=delta,
                    embeds=embeds[row])
        batcher = self._ensure_batcher(longest + max_new_tokens)
        token_lists = batcher.run(requests)  # type: ignore[arg-type]
        return [self.tokenizer.decode(tokens) for tokens in token_lists]

    def read(self, image, prompt: str, max_new_tokens: int) -> str:
        return self.read_batch([image], prompt, max_new_tokens)[0]

    def release(self) -> None:
        """No-op: the model stays HBM-resident (API parity hook)."""


class JaxReasoningBackend:
    """On-device Qwen3 chat decode for the critic/editor/arbitrator.

    With :meth:`shard`, the reasoning model runs tensor-parallel over the
    mesh's "model" axis — this is how the 32B flagship (qwen3:32b, ref
    config.py:8) serves on v5e-class chips: int8 weights ≈ 32.8 GB need
    TP≥4 at 16 GB/chip, and TP-sharding both engines over one mesh keeps
    the 7B VLM + 32B LLM co-resident with no load/unload thrash
    (parallel/budget.py carries the HBM arithmetic).
    """

    def __init__(self, model, tokenizer: TextTokenizer,
                 enable_thinking: bool = cfg_mod.LLM_ENABLE_THINKING,
                 serving: str | None = None, stream: bool = False):
        self.model = model
        self.tokenizer = tokenizer
        self.enable_thinking = enable_thinking
        self.mesh = None
        # "paged" (default): continuous batching — mixed-length agent calls
        # share slots, finished calls free blocks mid-batch, and tokens
        # stream to the host every chunk. "dense": contiguous-cache A/B path.
        self.serving = serving or os.environ.get("HOCR_LLM_SERVING", "paged")
        # Live token streaming to stdout (reference tools.py:187-208).
        self.stream = stream
        self._batcher = None

    def shard(self, mesh, fsdp: bool = False) -> "JaxReasoningBackend":
        """Place model params on ``mesh`` (TP over "model", opt. FSDP)."""
        from handwritten_ocr_tpu.parallel.sharding import shard_params
        self.model.params = shard_params(mesh, self.model.params, fsdp=fsdp)
        self.mesh = mesh
        self._batcher = None                 # rebuild against sharded params
        return self

    def _run(self, fn, *args, **kwargs):
        if self.mesh is not None:
            with self.mesh:
                return fn(*args, **kwargs)
        return fn(*args, **kwargs)

    def _ensure_batcher(self, needed_context: int):
        """(Re)build the serving batcher when the context bound grows.

        The context bound rounds up to a power of two (floor 512): every
        distinct bound compiles a fresh program set, so fine-grained
        bounds would recompile on nearly every prompt-length change,
        while the table-width ladder already keeps attention reads
        length-bounded inside an oversized table — the only cost of
        rounding up is pool capacity."""
        from handwritten_ocr_tpu.engine.serving import (
            ContinuousBatcher, PagedProgram)
        block = cfg_mod.SERVE_BLOCK_SIZE
        context = 512
        while context < needed_context:
            context *= 2
        if self._batcher is None or self._batcher.max_context < context:
            program = PagedProgram(self.model.params, self.model.config,
                                   mesh=self.mesh)
            self._batcher = ContinuousBatcher(
                program, n_slots=cfg_mod.SERVE_SLOTS, block_size=block,
                max_context=context, chunk=cfg_mod.SERVE_CHUNK,
                throughput_chunk=cfg_mod.SERVE_THROUGHPUT_CHUNK,
                prefill_bucket=cfg_mod.SERVE_PREFILL_BUCKET,
                dtype=self.model.params["embed"]["w"].dtype,
                kv_quant=_kv_quant())
        return self._batcher

    def _stream_printer(self):
        """on_tokens callback: prints decoded text incrementally."""
        state = {"ids": [], "printed": ""}

        def emit(new_tokens: list[int], done: bool) -> None:
            state["ids"].extend(new_tokens)
            text = self.tokenizer.decode(state["ids"])
            if not done:
                text = text.rstrip("�")   # hold incomplete multibyte
            if text.startswith(state["printed"]):
                delta = text[len(state["printed"]):]
            else:                              # decoder backtracked; resync
                delta = ""
            if delta:
                print(delta, end="", flush=True)
                state["printed"] = text
            if done:
                print(flush=True)
        return emit

    def _generate_paged(self, encoded: list[list[int]],
                        max_tokens: int) -> list[str]:
        """All prompts through the continuous batcher; returns texts.
        Streams to stdout only for single-request calls (interleaved
        multi-request streams would garble the console)."""
        from handwritten_ocr_tpu.engine.serving import GenRequest
        longest = max(len(ids) for ids in encoded)
        batcher = self._ensure_batcher(longest + max_tokens)
        stream = self._stream_printer() if self.stream and len(encoded) == 1 \
            else None
        # Prompt-lookup speculation: agent outputs copy their prompts
        # heavily (the editor returns the WHOLE corrected page, the
        # arbitrator one of the versions verbatim), so drafting from the
        # prompt verifies many tokens per dispatch, greedy-identical.
        # HOCR_SPEC=0 disables (e.g. benchmarking plain decode).
        requests = [GenRequest(np.asarray(ids, np.int32), max_tokens,
                               on_tokens=stream, speculate=_spec_enabled())
                    for ids in encoded]
        token_lists = batcher.run(requests)
        return [self.tokenizer.decode(tokens) for tokens in token_lists]

    @classmethod
    def from_pretrained(cls, model_dir: str | Path, dtype=jnp.bfloat16,
                        quantize: str | None = None) -> "JaxReasoningBackend":
        from handwritten_ocr_tpu.models.qwen3 import Qwen3Config, Qwen3Model
        model_dir = Path(model_dir)
        if (model_dir / "meta.json").exists():  # native pre-converted ckpt
            from handwritten_ocr_tpu.models.checkpoint import load_checkpoint
            params, meta = load_checkpoint(model_dir)
            config = Qwen3Config.from_hf(meta["hf_config"])
        else:
            from handwritten_ocr_tpu.models.weights import convert_qwen3
            config = Qwen3Config.from_pretrained_dir(model_dir)
            params = convert_qwen3(model_dir, config, dtype=dtype)
        if quantize == "int8":
            from handwritten_ocr_tpu.models.quant import quantize_tree
            params = quantize_tree(params)
        return cls(Qwen3Model(params, config), HFTokenizer(model_dir))

    def _chat_guided(self, encoded: list[list[int]],
                     json_schema: dict, max_tokens: int) -> list[str | None]:
        """Schema-constrained decode for a batch of prompts: the host
        forces the JSON scaffolding and type-constrains every value, so
        each non-None result ALWAYS validates against ``json_schema`` —
        the on-device, batched counterpart of Ollama's server-side
        ``format=json_schema`` (ref tools.py:270-276). None = the model
        emitted EOS before a required field (callers' ladder recovers)."""
        import json as _json
        from handwritten_ocr_tpu.engine.serving import GenRequest
        longest = max(len(ids) for ids in encoded)
        batcher = self._ensure_batcher(longest + max_tokens)
        # speculate: string value spans (corrected_text, segment quotes)
        # draft from the prompt via n-gram lookup — the editor copies its
        # input almost verbatim, so verify rounds accept whole windows.
        requests = [GenRequest(np.asarray(ids, np.int32), max_tokens,
                               speculate=_spec_enabled())
                    for ids in encoded]
        outcomes = batcher.run_guided(requests, json_schema, self.tokenizer)
        return [(_json.dumps(obj) if obj is not None and complete else None)
                for obj, complete in outcomes]

    def chat(self, system_prompt: str, user_message: str, *,
             temperature: float, max_tokens: int,
             json_schema: dict | None = None) -> str:
        """Greedy chat decode; ``json_schema`` requests schema-constrained
        JSON output (template-forced scaffolding + type-constrained value
        spans). ``temperature`` is accepted for protocol parity (reference
        uses 0.1 ≈ greedy)."""
        prompt = llm_chat_prompt(system_prompt, user_message,
                                 enable_thinking=self.enable_thinking)
        ids = np.array([self.tokenizer.encode(prompt)], dtype=np.int32)
        if json_schema is not None and self.serving == "paged":
            [constrained] = self._chat_guided([ids[0].tolist()], json_schema,
                                              max_tokens)
            if constrained is not None:
                return constrained
            # Model bailed before a required field: free decode + ladder.
        elif json_schema is not None:
            constrained = self._run(self.model.generate_json, ids, max_tokens,
                                    self.tokenizer)
            if constrained:
                return constrained
            # No viable constrained output: fall through to free decode
            # (the caller's parse ladder takes over).
        if self.serving == "paged":
            return self._generate_paged([ids[0].tolist()], max_tokens)[0]
        gen = self._run(self.model.generate, ids, max_tokens)
        length = int(np.asarray(gen.lengths)[0])
        return self.tokenizer.decode(np.asarray(gen.tokens)[0, :length].tolist())

    def chat_batch(self, requests, *, temperature: float,
                   max_tokens: int,
                   json_schema: dict | None = None) -> list[str]:
        """Many chat turns as ONE batched decode (left-padded prompts).

        Powers the lockstep multi-page driver: all active pages' critic
        (or editor/arbitrator) calls share a single prefill + decode.
        With ``json_schema``, the batch runs schema-constrained (tier-1
        structured output, same guarantee as single calls); rows where the
        model bails before a required field fall back to free decode.
        """
        prompts = [llm_chat_prompt(r.system, r.user,
                                   enable_thinking=self.enable_thinking)
                   for r in requests]
        encoded = [self.tokenizer.encode(p) for p in prompts]
        if json_schema is not None and self.serving == "paged":
            constrained = self._chat_guided(encoded, json_schema, max_tokens)
            missing = [i for i, text in enumerate(constrained)
                       if text is None]
            if missing:
                free = self._generate_paged([encoded[i] for i in missing],
                                            max_tokens)
                for index, text in zip(missing, free):
                    constrained[index] = text
            return constrained  # type: ignore[return-value]
        if self.serving == "paged":
            # Continuous batching: mixed-length prompts skip the pad-to-
            # longest prefill, and a call that hits EOS frees its slot for
            # the queue instead of idling until the longest call finishes.
            return self._generate_paged(encoded, max_tokens)
        longest = max(len(ids) for ids in encoded)
        pad_id = self.model.config.pad_token_id % self.model.config.vocab_size
        batch_ids = np.full((len(encoded), longest), pad_id, dtype=np.int32)
        pad_mask = np.zeros((len(encoded), longest), dtype=bool)
        for row, ids in enumerate(encoded):
            batch_ids[row, longest - len(ids):] = ids
            pad_mask[row, longest - len(ids):] = True
        gen = self._run(self.model.generate, batch_ids, max_tokens,
                        pad_mask=pad_mask)
        tokens = np.asarray(gen.tokens)
        lengths = np.asarray(gen.lengths)
        return [self.tokenizer.decode(tokens[row, :lengths[row]].tolist())
                for row in range(len(encoded))]


def build_jax_pipeline(quiet: bool = False) -> OCRPipeline:
    """Full TPU pipeline from local checkpoints (env-var discovery)."""
    ocr_dir = os.environ.get(OLMOCR_DIR_ENV)
    llm_dir = os.environ.get(QWEN3_DIR_ENV)
    missing = [name for name, val in
               [(OLMOCR_DIR_ENV, ocr_dir), (QWEN3_DIR_ENV, llm_dir)]
               if not val or not Path(val).exists()]
    if missing:
        raise SystemExit(
            "jax backend needs local model checkpoints. Set "
            + " and ".join(missing)
            + " to directories containing config.json + *.safetensors + "
              "tokenizer files (HF snapshots of "
              f"{cfg_mod.OLMOCR_MODEL} and a Qwen3 reasoning model). "
              "For a model-free smoke run use --backend dryrun."
        )
    from handwritten_ocr_tpu.engine.prefetch import PrimedOCRBackend
    if not quiet:
        print(f"  [engine] Loading OCR model from {ocr_dir}...")
    ocr = PrimedOCRBackend(JaxOCRBackend.from_pretrained(ocr_dir))
    if not quiet:
        print(f"  [engine] Loading reasoning model from {llm_dir}...")
    llm = JaxReasoningBackend.from_pretrained(llm_dir)
    llm.stream = not quiet       # live token streaming (ref tools.py:187-208)
    return OCRPipeline(ocr, llm, preprocessor=TPUPreprocessor(), quiet=quiet)
