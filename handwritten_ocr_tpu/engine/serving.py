"""Continuous batching over the paged KV cache.

The serving loop the reference can't express (it generates one call at a
time, tools.py:764-765) and round 1's lockstep decode only approximated:
a fixed set of S decode **slots** steps together in jitted chunks; at every
chunk boundary the host retires sequences that hit EOS or their budget
(freeing their cache blocks immediately) and admits queued requests into
the freed slots. A finished page stops paying for the longest page's
budget — the chunk boundary is the preemption point.

Design for TPU:
- All shapes static: one compiled prefill per prompt-length bucket, one
  compiled decode chunk for the server's lifetime.
- The whole chunk (default 16 steps) is ONE dispatch (``lax.while_loop``)
  — amortizes the 3-5 ms tunnel latency and gives the host a natural
  point to stream tokens (``on_tokens`` callbacks power live stdout
  streaming, ref tools.py:187-208).
- The block pool threads through jit with buffer donation, so the cache
  never copies.

Works for both decoder stacks (they share the init_text layout): Qwen3
reasoning chat (1D RoPE) and the Qwen2.5-VL text decoder (M-RoPE decode
steps at ``lengths + rope_delta``); the VL vision splice happens in the
caller-provided prompt embeddings.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu.models.paged import PagedKVCache, paged_forward
from handwritten_ocr_tpu.models.qwen25vl.language import lm_logits


_STOP_MASK_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _string_stop_mask(tokenizer, vocab_size: int, eos: int) -> np.ndarray:
    """Bool[vocab]: token text contains a quote character (or is EOS) —
    the device-side stall condition for chunked string spans. A '\"' is a
    single byte, so byte-level BPE can never split it across tokens; the
    host still verifies escape parity on the joint text. Built once per
    (tokenizer, vocab) and cached."""
    key = (id(tokenizer), vocab_size)
    cached = _STOP_MASK_CACHE.get(key)
    if cached is not None:
        return cached
    mask = _load_stop_mask(tokenizer, vocab_size)
    if mask is None:
        mask = np.zeros((vocab_size,), bool)
        # Fast path: one Rust-side decode_batch call (HF fast tokenizers)
        # instead of vocab_size Python decode() round-trips — the latter
        # is a multi-second single-core stall on 152k vocabs.
        backend = getattr(tokenizer, "_tokenizer", None)
        if backend is not None and hasattr(backend, "decode_batch"):
            texts = backend.decode_batch([[t] for t in range(vocab_size)],
                                         skip_special_tokens=False)
            for token, text in enumerate(texts):
                if '"' in text:
                    mask[token] = True
        else:
            for token in range(vocab_size):
                if '"' in tokenizer.decode([token]):
                    mask[token] = True
        _save_stop_mask(tokenizer, vocab_size, mask)
    mask = mask.copy()
    mask[eos] = True
    _STOP_MASK_CACHE[key] = mask
    return mask


def _stop_mask_path(tokenizer, vocab_size: int):
    """Cross-run cache file for the stop mask, keyed by the tokenizer's
    name_or_path (None when the tokenizer has no stable identity)."""
    import hashlib
    import os
    import pathlib
    name = str(getattr(tokenizer, "name_or_path", "") or "")
    if not name:
        return None
    digest = hashlib.sha256(f"{name}:{vocab_size}".encode()).hexdigest()[:16]
    root = os.environ.get("HOCR_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "handwritten_ocr_tpu")
    return pathlib.Path(root) / f"stop_mask_{digest}.npy"


def _load_stop_mask(tokenizer, vocab_size: int) -> np.ndarray | None:
    path = _stop_mask_path(tokenizer, vocab_size)
    if path is None or not path.exists():
        return None
    try:
        mask = np.load(path)
        if mask.shape == (vocab_size,) and mask.dtype == bool:
            return mask
    except Exception:
        pass
    return None


def _save_stop_mask(tokenizer, vocab_size: int, mask: np.ndarray) -> None:
    path = _stop_mask_path(tokenizer, vocab_size)
    if path is None:
        return
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp.npy")
        np.save(tmp, mask)
        tmp.replace(path)
    except OSError:
        pass


@dataclasses.dataclass
class GenRequest:
    """One generation job for the batcher."""

    prompt_ids: np.ndarray                      # [T] int32
    max_new: int
    on_tokens: Callable[[list[int], bool], None] | None = None
    # Optional M-RoPE inputs (VL path): full [3, T] prompt positions and
    # the decode-step rope delta; None = 1D RoPE from arange.
    positions: np.ndarray | None = None
    rope_delta: int = 0
    # Optional pre-spliced prompt embeddings [T, D] (VL vision splice);
    # None = embedding-table lookup of prompt_ids.
    embeds: jax.Array | None = None
    # Self-speculative n-gram drafting (prompt-lookup decoding): draft the
    # next tokens from the last place the current suffix n-gram appeared
    # in (prompt + generated), verify them all in ONE forward, accept the
    # longest greedy-matching prefix. Greedy-invisible: bit-identical to
    # plain greedy where verify and step share numerics (CPU tests);
    # on TPU the K+1-token verify matmuls tile differently, so only
    # genuine near-ties can flip (trained models don't sit on ties).
    # Pays off hugely for the editor/arbitrator agents, whose outputs
    # largely copy their prompts.
    speculate: bool = False
    # Teacher-forced drafting (measurement harness, scripts/spec_scale_ab):
    # when set, drafts are read from this token stream at the current
    # generated offset instead of prompt-lookup — the verify/accept path
    # is untouched production code, only the draft SOURCE differs. Lets
    # acceptance be controlled at any model width (random weights never
    # accept an n-gram draft), so speculation's dispatch economics are
    # measurable at the width the engine actually serves. Never set by
    # production callers.
    draft_oracle: np.ndarray | None = None
    # Filled by the batcher:
    tokens: list[int] = dataclasses.field(default_factory=list)
    done: bool = False

    def _emit(self, new_tokens: list[int], done: bool) -> None:
        self.tokens.extend(new_tokens)
        self.done = done
        if self.on_tokens is not None and (new_tokens or done):
            self.on_tokens(new_tokens, done)


def _ngram_draft(context: np.ndarray, k: int, max_n: int = 3,
                 min_n: int = 2) -> np.ndarray:
    """Prompt-lookup draft: continuation after the LAST earlier occurrence
    of the current suffix n-gram (longest n first). Returns <= k tokens
    (possibly none). Pure host-side numpy — no model, no device."""
    length = len(context)
    for n in range(max_n, min_n - 1, -1):
        if length < n + 1:
            continue
        suffix = context[length - n:]
        windows = np.lib.stride_tricks.sliding_window_view(
            context[:length - 1], n)
        hits = np.nonzero((windows == suffix).all(axis=1))[0]
        if len(hits):
            i = int(hits[-1])
            cont = context[i + n: i + n + k]
            if len(cont):
                return cont.astype(np.int32)
    return np.empty(0, np.int32)


class PagedProgram:
    """Jitted paged prefill + chunked decode over one decoder stack.

    ``params`` is an init_text-layout tree (embed/layers/final_norm/
    lm_head) — the Qwen3 tree or a VL model's ``params["text"]``.
    """

    def __init__(self, params: dict, cfg, *, eos_token_id: int | None = None,
                 mesh=None):
        self.params = params
        self.cfg = cfg
        self.eos_token_id = (eos_token_id if eos_token_id is not None
                             else cfg.eos_token_id)
        self.mrope = getattr(cfg, "mrope_section", None) is not None
        self.mesh = mesh

    # ── jitted stages ─────────────────────────────────────────────
    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _prefill(self, params, cache, embeds, positions, true_len, slot_ids):
        start = jnp.zeros_like(true_len)
        hidden, cache = paged_forward(params, self.cfg, embeds, positions,
                                      cache, slot_ids, start, true_len,
                                      fresh=True)
        idx = jnp.broadcast_to((true_len - 1)[:, None, None],
                               (hidden.shape[0], 1, hidden.shape[-1]))
        last_hidden = jnp.take_along_axis(hidden, idx, axis=1)
        logits = lm_logits(params, self.cfg, last_hidden)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    @functools.partial(jax.jit, static_argnums=(0, 7, 8), donate_argnums=(2,))
    def _decode_chunk(self, params, cache, last, done0, remaining,
                      rope_delta, chunk, table_pages=None):
        cfg = self.cfg
        eos = self.eos_token_id
        n_slots = last.shape[0]
        slot_ids = jnp.arange(n_slots)
        tokens0 = jnp.full((n_slots, chunk), eos, jnp.int32)

        def cond(state):
            i, _, _, _, done = state
            return (i < chunk) & ~jnp.all(done)

        def body(state):
            i, tokens, cache, last, done = state
            embeds = params["embed"]["w"][last][:, None, :]
            start = cache.lengths
            pos = (start + rope_delta)[:, None]                 # [S, 1]
            if self.mrope:
                pos = jnp.broadcast_to(pos[None], (3, n_slots, 1))
            hidden, cache = paged_forward(params, cfg, embeds, pos, cache,
                                          slot_ids, start, start + 1,
                                          attn_valid=~done,
                                          table_pages=table_pages)
            logits = lm_logits(params, cfg, hidden)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, eos, nxt)
            tokens = tokens.at[:, i].set(nxt)
            done = done | (nxt == eos) | (i + 1 >= remaining)
            return i + 1, tokens, cache, nxt, done

        _, tokens, cache, last, done = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tokens0, cache, last, done0))
        return tokens, cache, last, done

    @functools.partial(jax.jit, static_argnums=(0, 6), donate_argnums=(2,))
    def _prefill_topk(self, params, cache, embeds, positions, true_len,
                      k, slot_ids):
        """Prefill variant returning the next-token top-k (guided decode)."""
        start = jnp.zeros_like(true_len)
        hidden, cache = paged_forward(params, self.cfg, embeds, positions,
                                      cache, slot_ids, start, true_len,
                                      fresh=True)
        idx = jnp.broadcast_to((true_len - 1)[:, None, None],
                               (hidden.shape[0], 1, hidden.shape[-1]))
        last_hidden = jnp.take_along_axis(hidden, idx, axis=1)
        logits = lm_logits(params, self.cfg, last_hidden)[:, -1]
        values, ids = jax.lax.top_k(logits, k)
        return ids, values, cache

    @functools.partial(jax.jit, static_argnums=(0, 8, 9), donate_argnums=(2,))
    def _string_chunk(self, params, cache, last, auto0, remaining,
                      stop_mask, rope_delta, chunk, table_pages=None):
        """Free-greedy decode of string value spans inside guided decode.

        Slots with ``auto0`` True advance greedily until they emit a token
        whose text contains a quote character (``stop_mask``), hit EOS, or
        exhaust ``remaining`` — then they stall. Frozen slots (auto False)
        re-execute their last position idempotently (write-before-read
        makes the duplicate write harmless) without advancing ``lengths``.
        One dispatch decodes up to ``chunk`` string tokens for every
        active slot — the whole point: string spans dominate constrained
        agent outputs (corrected_text is a full page), and this removes
        the per-token host round trip for them.
        """
        cfg = self.cfg
        eos = self.eos_token_id
        n_slots = last.shape[0]
        slot_ids = jnp.arange(n_slots)
        tokens0 = jnp.full((n_slots, chunk), eos, jnp.int32)

        def cond(state):
            i, _, _, _, auto = state
            return (i < chunk) & jnp.any(auto)

        def body(state):
            i, tokens, cache, last, auto = state
            embeds = params["embed"]["w"][last][:, None, :]
            start = cache.lengths
            pos = (start + rope_delta)[:, None]
            if self.mrope:
                pos = jnp.broadcast_to(pos[None], (3, n_slots, 1))
            new_len = jnp.where(auto, start + 1, start)
            hidden, cache = paged_forward(params, cfg, embeds, pos, cache,
                                          slot_ids, start, new_len,
                                          attn_valid=auto,
                                          table_pages=table_pages)
            logits = lm_logits(params, cfg, hidden)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            committed = jnp.where(auto, nxt, last)
            tokens = tokens.at[:, i].set(jnp.where(auto, nxt, eos))
            stall = stop_mask[nxt] | (nxt == eos) | (i + 1 >= remaining)
            auto = auto & ~stall
            return i + 1, tokens, cache, committed, auto

        _, tokens, cache, last, auto = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tokens0, cache, last, auto0))
        return tokens, cache, last, auto

    @functools.partial(jax.jit, static_argnums=(0, 8), donate_argnums=(2,))
    def _verify_step(self, params, cache, last, drafts, draft_len, active,
                     rope_delta, table_pages=None):
        """Speculative verify: score ``[last, draft_0..draft_{K-1}]`` in
        one forward and accept the longest prefix of drafts that greedy
        decode would have produced — output is bit-identical to K+1
        sequential greedy steps for the accepted prefix plus the bonus
        token at the first divergence.

        drafts [S, K] int32 (junk beyond draft_len[s]); active [S] marks
        slots whose drafts/outputs are real. Writes k/v for all K+1
        positions but records lengths = start + 1 + accepted — rejected
        positions hold junk that later steps overwrite write-before-read
        (the same invariant right-padded prefill relies on). Inactive
        slots stay frozen (lengths unchanged; junk writes land in their
        stale rows, whose blocks only reassign after a table push).

        Returns (tokens [S, K+1], accepted [S], cache).
        """
        cfg = self.cfg
        n_slots, k = drafts.shape
        slot_ids = jnp.arange(n_slots)
        in_tokens = jnp.concatenate([last[:, None], drafts], axis=1)
        embeds = params["embed"]["w"][in_tokens]             # [S, K+1, D]
        start = cache.lengths
        pos = (start + rope_delta)[:, None] + jnp.arange(k + 1)[None, :]
        if self.mrope:
            pos = jnp.broadcast_to(pos[None], (3, n_slots, k + 1))
        # Per-token validity: position i is real for i <= draft_len[s]
        # (0 = the committed last token, 1..draft_len = drafts). Junk
        # tail positions skip all attention page reads on the TPU kernel
        # path; their argmax is garbage the match mask never consults.
        token_valid = (active[:, None]
                       & (jnp.arange(k + 1)[None, :] <= draft_len[:, None]))
        hidden, cache = paged_forward(params, cfg, embeds, pos, cache,
                                      slot_ids, start, start,  # len set below
                                      attn_valid=token_valid,
                                      table_pages=table_pages)
        logits = lm_logits(params, cfg, hidden)              # [S, K+1, V]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        match = ((nxt[:, :k] == drafts)
                 & (jnp.arange(k)[None, :] < draft_len[:, None]))
        accepted = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
        new_lengths = jnp.where(
            active,
            jnp.minimum(start + 1 + accepted, cache.max_context),
            cache.lengths)
        return nxt, accepted, cache._replace(lengths=new_lengths)

    @functools.partial(jax.jit, static_argnums=(0, 6, 7), donate_argnums=(2,))
    def _step_topk(self, params, cache, last, active, rope_delta, k,
                   table_pages=None):
        """One decode step for ALL slots returning per-slot top-k — the
        schema-guided decode's device primitive: the host commits one
        token per slot per step (forced scaffold or constrained choice).
        ``active`` (bool [S]) marks slots with live sessions; inactive
        slots advance their (junk) position but skip all attention page
        reads — their top-k is garbage the host never looks at."""
        cfg = self.cfg
        n_slots = last.shape[0]
        embeds = params["embed"]["w"][last][:, None, :]
        start = cache.lengths
        pos = (start + rope_delta)[:, None]
        if self.mrope:
            pos = jnp.broadcast_to(pos[None], (3, n_slots, 1))
        hidden, cache = paged_forward(params, cfg, embeds, pos, cache,
                                      jnp.arange(n_slots), start, start + 1,
                                      attn_valid=active,
                                      table_pages=table_pages)
        logits = lm_logits(params, cfg, hidden)[:, -1]
        values, ids = jax.lax.top_k(logits, k)
        return ids, values, cache

    # ── mesh-aware wrappers ───────────────────────────────────────
    def prefill_topk(self, cache, embeds, positions, true_len, k, slot_ids):
        args = (self.params, cache, embeds, positions, true_len, k, slot_ids)
        if self.mesh is not None:
            with self.mesh:
                return self._prefill_topk(*args)
        return self._prefill_topk(*args)

    def verify_step(self, cache, last, drafts, draft_len, active,
                    rope_delta, table_pages=None):
        args = (self.params, cache, last, drafts, draft_len, active,
                rope_delta, table_pages)
        if self.mesh is not None:
            with self.mesh:
                return self._verify_step(*args)
        return self._verify_step(*args)

    def step_topk(self, cache, last, rope_delta, k, active=None,
                  table_pages=None):
        if active is None:
            active = jnp.ones(last.shape, bool)
        args = (self.params, cache, last, active, rope_delta, k, table_pages)
        if self.mesh is not None:
            with self.mesh:
                return self._step_topk(*args)
        return self._step_topk(*args)

    def string_chunk(self, cache, last, auto, remaining, stop_mask,
                     rope_delta, chunk, table_pages=None):
        args = (self.params, cache, last, auto, remaining, stop_mask,
                rope_delta, chunk, table_pages)
        if self.mesh is not None:
            with self.mesh:
                return self._string_chunk(*args)
        return self._string_chunk(*args)

    def prefill(self, cache, embeds, positions, true_len, slot_ids):
        args = (self.params, cache, embeds, positions, true_len, slot_ids)
        if self.mesh is not None:
            with self.mesh:
                return self._prefill(*args)
        return self._prefill(*args)

    def decode_chunk(self, cache, last, done, remaining, rope_delta, chunk,
                     table_pages=None):
        args = (self.params, cache, last, done, remaining, rope_delta, chunk,
                table_pages)
        if self.mesh is not None:
            with self.mesh:
                return self._decode_chunk(*args)
        return self._decode_chunk(*args)

    def embed_prompt(self, ids: jax.Array) -> jax.Array:
        """Default prompt embedding (no vision splice): table lookup."""
        return self.params["embed"]["w"][ids]


class ContinuousBatcher:
    """Slot/block scheduler driving a :class:`PagedProgram`.

    Parameters
    ----------
    n_slots : decode batch width (static).
    block_size : KV block granularity (tokens).
    n_blocks : pool size; block 0 is the reserved trash sink.
    max_context : per-sequence context bound (table width).
    chunk : decode steps per dispatch (admission/retirement granularity).
    prefill_bucket : prompt lengths pad up to a multiple of this (bounds
        the number of compiled prefill programs).
    """

    def __init__(self, program: PagedProgram, *, n_slots: int = 8,
                 block_size: int = 64, n_blocks: int | None = None,
                 max_context: int = 4096, chunk: int = 16,
                 prefill_bucket: int = 128, draft_k: int = 16,
                 dtype=jnp.bfloat16, kv_quant: bool = False,
                 throughput_chunk: int | None = None):
        cfg = program.cfg
        self.program = program
        self.n_slots = n_slots
        self.block_size = block_size
        self.max_context = max_context
        self.max_blocks = -(-max_context // block_size)
        if n_blocks is None:
            n_blocks = 1 + n_slots * self.max_blocks
        self.n_blocks = n_blocks
        self.chunk = chunk
        # Dispatch size when no live request streams tokens: each
        # dispatch pays a fixed host round-trip, so throughput workloads
        # (batch reads, agent batches) amortize it over a bigger chunk
        # (measured 67.9% -> 83.5% of the decode HBM floor going
        # 16 -> 128 at 24 slots); streaming requests keep the small
        # chunk as their token-flush cadence.
        self.throughput_chunk = throughput_chunk or chunk
        self.prefill_bucket = prefill_bucket
        # Sub-128 block sizes keep int8 KV: the fused kernel's scale-page
        # RMW needs 128-lane-aligned [Hkv, BS] slices, so paged.py routes
        # such caches to the portable scatter+gather path instead.
        if kv_quant and block_size % 128 != 0:
            print(f"[serving] kv_quant with block_size={block_size} "
                  "(not a multiple of 128): decode runs the portable "
                  "XLA scatter+gather path (full-window dequant per "
                  "layer), not the fused TPU kernel — expect a large "
                  "per-step cost. Use block_size=128 for the fast path.")
        self.cache = PagedKVCache.zeros(
            cfg.num_hidden_layers, n_blocks, block_size, n_slots,
            self.max_blocks, cfg.num_key_value_heads, cfg.head_dim,
            dtype=dtype, kv_quant=kv_quant)
        self._free_blocks: list[int] = list(range(n_blocks - 1, 0, -1))
        self._tables = np.zeros((n_slots, self.max_blocks), np.int32)
        self._free_slots: list[int] = list(range(n_slots - 1, -1, -1))
        self._slot_req: dict[int, GenRequest] = {}
        self._slot_blocks: dict[int, list[int]] = {}
        self._last = np.full((n_slots,), program.eos_token_id, np.int32)
        self._rope_delta = np.zeros((n_slots,), np.int32)
        # Host mirror of each slot's device cache length (set at prefill,
        # advanced in lockstep with the decode loops). Drives the table-
        # width ladder: attention reads scale with table width, so every
        # dispatch attends over the narrowest power-of-two page count
        # covering all live slots instead of the full budget-cap table.
        self._host_len = np.zeros((n_slots,), np.int64)
        # Speculative decoding state (requests opt in via GenRequest):
        # draft_k tokens drafted per verify round; a cooldown chunk after
        # a low-acceptance round keeps pathological inputs from paying a
        # dispatch per token.
        self.draft_k = draft_k
        self._spec_cooldown = 0
        self.spec_stats = {"rounds": 0, "drafted": 0, "accepted": 0}

    def _table_pages(self, slots, margin: int) -> int | None:
        """Narrowest ladder width (pages) covering ``host_len + margin``
        for every slot in ``slots``; None = full table. Ladder widths are
        powers of two (bounded compile count). Live slots' reads AND
        writes stay below ``width * block_size`` by construction; stale
        slots' junk writes clamp into rows whose blocks are free (frees
        only reassign after the zeroed table row is pushed)."""
        slots = list(slots)
        if not slots:
            return None
        needed = max(self._host_len[slot] for slot in slots) + margin
        blocks = -(-int(needed) // self.block_size)
        width = 8
        while width < blocks:
            width *= 2
        return None if width >= self.max_blocks else width

    # ── admission ─────────────────────────────────────────────────
    def _blocks_needed(self, request: GenRequest) -> int:
        total = min(len(request.prompt_ids) + request.max_new,
                    self.max_context)
        return -(-total // self.block_size)

    def _try_admit(self, queue: deque) -> list[tuple[int, GenRequest]]:
        admitted = []
        while queue and self._free_slots:
            request = queue[0]
            need = self._blocks_needed(request)
            if need > len(self._free_blocks):
                break                      # head-of-line blocks; wait for frees
            queue.popleft()
            slot = self._free_slots.pop()
            blocks = [self._free_blocks.pop() for _ in range(need)]
            self._tables[slot] = 0
            self._tables[slot, :need] = blocks
            self._slot_req[slot] = request
            self._slot_blocks[slot] = blocks
            self._rope_delta[slot] = request.rope_delta
            admitted.append((slot, request))
        return admitted

    def _retire(self, slot: int) -> None:
        self._free_blocks.extend(self._slot_blocks.pop(slot))
        self._slot_req.pop(slot)
        self._free_slots.append(slot)
        self._tables[slot] = 0

    # Prefill activations scale with rows x bucket tokens; cap the rows
    # per dispatch so wide slot counts at long buckets don't blow HBM
    # (prefill is compute-bound — small row groups lose nothing).
    PREFILL_GROUP_TOKENS = 32768

    def _prefill_groups(self, admitted):
        """Split admitted requests into (bucket, sub-group) prefill
        dispatches: grouped by padded prompt length, each sub-group
        capped at PREFILL_GROUP_TOKENS total padded tokens."""
        by_bucket: dict[int, list[tuple[int, GenRequest]]] = {}
        for slot, request in admitted:
            bucket = max(self.prefill_bucket,
                         -(-len(request.prompt_ids) // self.prefill_bucket)
                         * self.prefill_bucket)
            by_bucket.setdefault(bucket, []).append((slot, request))
        for bucket, group in by_bucket.items():
            rows = max(1, self.PREFILL_GROUP_TOKENS // bucket)
            for lo in range(0, len(group), rows):
                yield bucket, group[lo:lo + rows]

    def _prefill_admitted(self, admitted: list[tuple[int, GenRequest]]) -> None:
        """Prefill admitted requests grouped by padded prompt length."""
        self.cache = self.cache._replace(
            block_tables=jnp.asarray(self._tables))
        for bucket, group in self._prefill_groups(admitted):
            slots = np.array([s for s, _ in group], np.int32)
            true_len = np.array([len(r.prompt_ids) for _, r in group],
                                np.int32)
            embeds, positions = self._build_prompt_inputs(group, bucket)
            first, self.cache = self.program.prefill(
                self.cache, embeds, positions, jnp.asarray(true_len),
                jnp.asarray(slots))
            first = np.asarray(first)
            for row, (slot, request) in enumerate(group):
                token = int(first[row])
                self._last[slot] = token
                self._host_len[slot] = len(request.prompt_ids)
                eos = token == self.program.eos_token_id
                finished = eos or request.max_new <= 1
                request._emit([] if eos else [token], finished)
                if finished:
                    self._retire(slot)

    def _build_prompt_inputs(self, group, bucket):
        batch = len(group)
        ids = np.zeros((batch, bucket), np.int32)
        for row, (_, request) in enumerate(group):
            ids[row, :len(request.prompt_ids)] = request.prompt_ids
        if self.program.mrope:
            positions = np.zeros((3, batch, bucket), np.int64)
            for row, (_, request) in enumerate(group):
                assert request.positions is not None, "VL prompts need positions"
                t = request.positions.shape[1]
                positions[:, row, :t] = request.positions
                # pad tail positions continue past the real ones (masked)
                positions[:, row, t:] = (request.positions.max()
                                         + 1 + np.arange(bucket - t))
        else:
            positions = np.broadcast_to(np.arange(bucket)[None],
                                        (batch, bucket)).copy()
        if any(request.embeds is not None for _, request in group):
            proto = next(r.embeds for _, r in group if r.embeds is not None)
            embeds = jnp.zeros((batch, bucket, proto.shape[-1]), proto.dtype)
            for row, (_, request) in enumerate(group):
                assert request.embeds is not None
                embeds = embeds.at[row, :request.embeds.shape[0]].set(
                    request.embeds.astype(embeds.dtype))
        else:
            embeds = self.program.embed_prompt(jnp.asarray(ids))
        return embeds, jnp.asarray(positions)

    # ── schema-guided serving (constrained decoding) ──────────────
    def run_guided(self, requests: Sequence[GenRequest], schema: dict,
                   tokenizer, top_k: int = 64) -> list[tuple[dict | None, bool]]:
        """Schema-constrained generation for every request (one shared
        schema — agent batches are same-schema by construction).

        Each decode step is ONE batched ``step_topk`` dispatch; the host
        commits one token per slot from the top-k under the schema state
        machine (utils/schema_decode.SchemaSession): scaffold tokens are
        forced, value tokens constrained by type. Returns per request
        ``(assembled object | None, complete)`` — complete=False only when
        EOS/budget died before a required field (callers fall back to the
        parse ladder, matching the reference's failure semantics).
        """
        from handwritten_ocr_tpu.utils.schema_decode import (
            SchemaSession, compile_schema)
        spec = compile_schema(schema)
        eos = self.program.eos_token_id
        queue = deque(requests)
        sessions: dict[int, SchemaSession] = {}
        committed: dict[int, list[int]] = {}     # per-slot generated ids
        results: dict[int, tuple[dict | None, bool]] = {}
        stop_mask_host = _string_stop_mask(tokenizer,
                                           self.program.cfg.vocab_size, eos)
        stop_mask_dev = jnp.asarray(stop_mask_host)

        def admit() -> None:
            admitted = self._try_admit(queue)
            if not admitted:
                return
            self.cache = self.cache._replace(
                block_tables=jnp.asarray(self._tables))
            for bucket, group in self._prefill_groups(admitted):
                slots = np.array([s for s, _ in group], np.int32)
                true_len = np.array([len(r.prompt_ids) for _, r in group],
                                    np.int32)
                embeds, positions = self._build_prompt_inputs(group, bucket)
                ids, _, self.cache = self.program.prefill_topk(
                    self.cache, embeds, positions, jnp.asarray(true_len),
                    top_k, jnp.asarray(slots))
                ids = np.asarray(ids)
                for row, (slot, request) in enumerate(group):
                    session = SchemaSession(spec, tokenizer, eos,
                                            request.max_new)
                    sessions[slot] = session
                    self._host_len[slot] = len(request.prompt_ids)
                    # Commit the first token now, establishing the loop
                    # invariant: _last committed but not yet embedded.
                    committed[slot] = []
                    token = session.next_token(ids[row])
                    if token is None:
                        # Degenerate plan (e.g. a propertyless schema)
                        # finishes without generating anything.
                        retire_slot(slot)
                    else:
                        self._last[slot] = token
                        committed[slot].append(token)

        def retire_slot(slot: int) -> None:
            request = self._slot_req[slot]
            results[id(request)] = sessions.pop(slot).result()
            committed.pop(slot, None)
            self._retire(slot)
            self._last[slot] = eos

        def string_verify_round() -> bool:
            """Speculative advance of in-span sessions: draft from
            (prompt + committed) with the stop tokens cut OUT of the
            draft (the device loop would have stalled there), verify in
            one dispatch, absorb accepted + bonus exactly like a chunk
            row. Returns False when drafts don't justify a dispatch —
            the caller then runs the plain chunked loop. Editor
            ``corrected_text`` spans copy the prompt almost verbatim, so
            this typically accepts whole draft windows."""
            if self._spec_cooldown > 0:
                self._spec_cooldown -= 1
                return False
            auto_slots = [slot for slot, session in sessions.items()
                          if session.in_string_span()
                          and self._slot_req[slot].speculate]
            if not auto_slots:
                return False
            drafts = np.zeros((self.n_slots, self.draft_k), np.int32)
            draft_len = np.zeros((self.n_slots,), np.int32)
            auto = np.zeros((self.n_slots,), bool)
            good = 0
            for slot in auto_slots:
                cap = min(self.draft_k, sessions[slot].budget - 1)
                if cap <= 0:
                    continue
                context = np.concatenate([
                    np.asarray(self._slot_req[slot].prompt_ids, np.int32),
                    np.asarray(committed[slot], np.int32)])
                draft = _ngram_draft(context, cap)
                stop_at = next((i for i, t in enumerate(draft)
                                if stop_mask_host[t]), len(draft))
                draft = draft[:stop_at]
                if len(draft) >= 2:
                    good += 1
                    auto[slot] = True
                    drafts[slot, :len(draft)] = draft
                    draft_len[slot] = len(draft)
            # Gate on ALL in-span sessions (not just the speculate-
            # flagged ones): non-drafting in-span slots make no progress
            # during a verify round, so drafters must dominate.
            n_in_span = sum(1 for s in sessions.values()
                            if s.in_string_span())
            if good * 2 < n_in_span or good == 0:
                return False
            tokens, accepted, self.cache = self.program.verify_step(
                self.cache, jnp.asarray(self._last), jnp.asarray(drafts),
                jnp.asarray(draft_len), jnp.asarray(auto),
                jnp.asarray(self._rope_delta),
                table_pages=self._table_pages(sessions, self.draft_k + 2))
            tokens = np.asarray(tokens)
            accepted = np.asarray(accepted)
            total = live = 0
            for slot in list(sessions):
                if not auto[slot]:
                    continue
                n_acc = int(accepted[slot])
                live += 1
                total += n_acc
                emitted = [int(t) for t in tokens[slot, :n_acc + 1]]
                self._host_len[slot] += 1 + n_acc
                self._last[slot] = emitted[-1]
                committed[slot].extend(emitted)
                sessions[slot].absorb_string_tokens(emitted)
                if sessions[slot].done:
                    retire_slot(slot)
            self.spec_stats["rounds"] += 1
            self.spec_stats["drafted"] += int(draft_len.sum())
            self.spec_stats["accepted"] += total
            if live and total / live < 2.0:
                self._spec_cooldown = 1
            return True

        def string_chunk_round() -> None:
            """Advance every session currently inside a string value span
            with the chunked device loop (one dispatch for up to ``chunk``
            string tokens per in-span slot; other slots freeze
            idempotently) instead of per-token host guidance."""
            auto = np.zeros((self.n_slots,), bool)
            remaining = np.zeros((self.n_slots,), np.int32)
            for slot, session in sessions.items():
                if session.in_string_span():
                    auto[slot] = True
                    remaining[slot] = max(session.budget, 0)
            tokens, self.cache, last, _ = self.program.string_chunk(
                self.cache, jnp.asarray(self._last), jnp.asarray(auto),
                jnp.asarray(remaining), stop_mask_dev,
                jnp.asarray(self._rope_delta), self.chunk,
                # Width covers frozen sessions too: they re-write (junk)
                # at their true position each step, which must not clamp
                # into cached history.
                table_pages=self._table_pages(sessions, self.chunk + 1))
            tokens = np.asarray(tokens)
            self._last = np.array(last)
            for slot in list(sessions):
                session = sessions[slot]
                if not auto[slot]:
                    continue
                row: list[int] = []
                for token in tokens[slot]:
                    token = int(token)
                    row.append(token)
                    if stop_mask_host[token] or token == eos:
                        break
                # Device advance == len(row) (it stalled at the same
                # token), except when the budget stalled it on a plain
                # token and the trailing filler EOS was also absorbed —
                # a +1 overcount that only widens the table bound, and
                # such sessions die (budget exhausted) this round anyway.
                self._host_len[slot] += len(row)
                committed[slot].extend(row)
                session.absorb_string_tokens(row)
                if session.done:
                    retire_slot(slot)

        # Loop invariant at every round boundary: each active slot's
        # ``_last`` token is committed but NOT yet embedded/written —
        # both stepping disciplines (the per-token step and the string
        # chunk) start by embedding ``_last``, so they compose freely.
        while queue or sessions:
            admit()
            if not sessions:
                if queue:
                    raise RuntimeError(
                        "request needs more KV blocks than the pool has")
                break
            # Drain string value spans: prompt-lookup verify rounds when
            # drafts are available (many tokens per dispatch on copy-
            # heavy spans), else the chunked device loop (one dispatch
            # per ~chunk string tokens). Afterwards no session is
            # mid-span: a resolved span always refills the forced
            # scaffold queue.
            while sessions and any(s.in_string_span()
                                   for s in sessions.values()):
                if not string_verify_round():
                    string_chunk_round()
            if queue and self._free_slots:
                admit()
            if not sessions:
                continue
            active = np.zeros((self.n_slots,), bool)
            for slot in sessions:
                active[slot] = True
                self._host_len[slot] += 1
            ids, _, self.cache = self.program.step_topk(
                self.cache, jnp.asarray(self._last),
                jnp.asarray(self._rope_delta), top_k,
                active=jnp.asarray(active),
                table_pages=self._table_pages(sessions, 2))
            ids = np.asarray(ids)
            for slot in list(sessions):
                session = sessions[slot]
                # None ⇒ the session finished (or exhausted and drained).
                token = session.next_token(ids[slot])
                if token is None:
                    retire_slot(slot)
                else:
                    self._last[slot] = token
                    committed[slot].append(token)
        return [results[id(request)] for request in requests]

    # ── speculative decoding (prompt-lookup drafting) ─────────────
    def _spec_drafts(self) -> tuple[np.ndarray, np.ndarray] | None:
        """Build per-slot drafts for a verify round, or None when a plain
        decode chunk is the better dispatch (nobody speculates, drafts
        came up empty, or a low-acceptance cooldown is active)."""
        if self._spec_cooldown > 0:
            self._spec_cooldown -= 1
            return None
        speculating = [slot for slot, request in self._slot_req.items()
                       if request.speculate]
        if not speculating:
            return None
        drafts = np.zeros((self.n_slots, self.draft_k), np.int32)
        draft_len = np.zeros((self.n_slots,), np.int32)
        good = 0
        for slot in speculating:
            request = self._slot_req[slot]
            cap = min(self.draft_k,
                      request.max_new - len(request.tokens) - 1)
            if cap <= 0:
                continue
            if request.draft_oracle is not None:
                pos = len(request.tokens)
                draft = np.asarray(
                    request.draft_oracle[pos:pos + cap], np.int32)
            else:
                context = np.concatenate([
                    np.asarray(request.prompt_ids, np.int32),
                    np.asarray(request.tokens, np.int32)])
                draft = _ngram_draft(context, cap)
            if len(draft) >= 2:
                good += 1
            drafts[slot, :len(draft)] = draft
            draft_len[slot] = len(draft)
        # Verify only when at least half of ALL live slots drafted
        # something substantial — a verify round costs one full weight
        # read and advances non-drafting slots by just 1 token (vs
        # ~chunk tokens in a plain chunk), so drafting slots must
        # dominate the batch for the dispatch to pay.
        if good * 2 < len(self._slot_req) or good == 0:
            return None
        return drafts, draft_len

    def _verify_round(self, drafts: np.ndarray, draft_len: np.ndarray) -> None:
        """One speculative dispatch: accept longest greedy-matching draft
        prefix + the bonus token for every live slot."""
        eos = self.program.eos_token_id
        active = np.zeros((self.n_slots,), bool)
        for slot in self._slot_req:
            active[slot] = True
        tokens, accepted, self.cache = self.program.verify_step(
            self.cache, jnp.asarray(self._last), jnp.asarray(drafts),
            jnp.asarray(draft_len), jnp.asarray(active),
            jnp.asarray(self._rope_delta),
            table_pages=self._table_pages(self._slot_req, self.draft_k + 2))
        tokens = np.asarray(tokens)
        accepted = np.asarray(accepted)
        total_acc = 0
        n_live = 0
        for slot in list(self._slot_req):
            request = self._slot_req[slot]
            n_acc = int(accepted[slot])
            n_live += 1
            total_acc += n_acc
            emitted = [int(t) for t in tokens[slot, :n_acc + 1]]
            self._host_len[slot] += 1 + n_acc      # device wrote these
            self._last[slot] = emitted[-1]         # committed, not embedded
            budget = request.max_new - len(request.tokens)
            fresh: list[int] = []
            finished = False
            for token in emitted:
                if token == eos:
                    finished = True
                    break
                fresh.append(token)
                if len(fresh) >= budget:
                    finished = True
                    break
            request._emit(fresh, finished)
            if finished:
                self._retire(slot)
        self.spec_stats["rounds"] += 1
        self.spec_stats["drafted"] += int(draft_len.sum())
        self.spec_stats["accepted"] += total_acc
        if n_live and total_acc / n_live < 2.0:
            self._spec_cooldown = 1                # next dispatch: a chunk

    # ── the serving loop ──────────────────────────────────────────
    def run(self, requests: Sequence[GenRequest]) -> list[list[int]]:
        """Drive all requests to completion; returns token lists in order
        (EOS excluded). Requests stream through ``on_tokens`` as chunks
        complete. Requests with ``speculate`` interleave prompt-lookup
        verify rounds with the plain decode chunks (greedy-identical
        output, several tokens per dispatch on copy-heavy spans)."""
        eos = self.program.eos_token_id
        queue = deque(requests)
        while queue or self._slot_req:
            admitted = self._try_admit(queue)
            if admitted:
                self._prefill_admitted(admitted)
            if not self._slot_req:
                if queue:        # nothing admissible yet nothing running
                    raise RuntimeError(
                        "request needs more KV blocks than the pool has: "
                        f"{self._blocks_needed(queue[0])} > "
                        f"{self.n_blocks - 1}")
                break
            spec = self._spec_drafts()
            if spec is not None:
                self._verify_round(*spec)
                continue
            done0 = np.ones((self.n_slots,), bool)
            remaining = np.zeros((self.n_slots,), np.int32)
            for slot, request in self._slot_req.items():
                done0[slot] = False
                remaining[slot] = request.max_new - len(request.tokens)
            chunk = (self.chunk
                     if any(r.on_tokens is not None
                            for r in self._slot_req.values())
                     else self.throughput_chunk)
            tokens, self.cache, last, _ = self.program.decode_chunk(
                self.cache, jnp.asarray(self._last), jnp.asarray(done0),
                jnp.asarray(remaining), jnp.asarray(self._rope_delta),
                chunk,
                table_pages=self._table_pages(self._slot_req,
                                              chunk + 1))
            tokens = np.asarray(tokens)
            self._last = np.array(last)      # writable copy (admission edits)
            for slot in list(self._slot_req):
                request = self._slot_req[slot]
                fresh: list[int] = []
                finished = False
                budget = request.max_new - len(request.tokens)
                for token in tokens[slot]:
                    token = int(token)
                    if token == eos:
                        finished = True
                        break
                    fresh.append(token)
                    if len(fresh) >= budget:
                        finished = True
                        break
                request._emit(fresh, finished)
                if finished:
                    self._retire(slot)
            for slot in self._slot_req:
                # Survivors ran the full chunk (the loop only exits early
                # when EVERY slot is done, and done slots get retired).
                self._host_len[slot] += chunk
        return [request.tokens for request in requests]
