#!/usr/bin/env python3
"""Trained-weights fidelity A/B: int8 weights + speculation on REAL margins.

Round-3 verdict, weak #5/#6: every invariance cell so far ran random-init
weights, whose greedy top-2 margins sit AT the numerics-noise scale — so
int8-weight fidelity stayed a literature citation and speculation never
accepted a draft (random models have no induction structure). This script
closes both holes with *trained* weights whose margins are orders of
magnitude above the noise band:

  VL phase (the transcription surface, ref tools.py:756-771):
    * renders pages of KNOWN text with a deterministic 5x7 bitmap font,
    * fine-tunes the tiny-VL architecture on (page -> transcription)
      with the production train step (train/step.py) until the greedy
      margins dwarf the dense-tiling noise,
    * A/Bs dense bf16 weights vs dense int8 weights (quantize_tree) and
      the SHIPPED serving path (paged, int8 KV) vs dense — reporting
      token agreement, CER vs ground truth on both sides, the margin
      distribution, and the int8 logit perturbation it must beat.

  LM phase (the reasoning surface, ref tools.py:149-208):
    * trains a tiny Qwen3 on a repetitive corpus (editor-style copy
      structure) with a plain LM objective,
    * runs the production ContinuousBatcher with speculation ON:
      prompt-lookup drafts now match the model's greedy continuations,
      so acceptance is finally exercised end-to-end on the chip,
    * reports acceptance rate, net tokens/s delta vs speculation OFF,
      and the int8-weight agreement for the trained LM.

Writes/merges the ``weights_int8_vs_bf16_trained`` and
``speculation_trained`` sections into serving_invariance_ab.json.

Usage: python scripts/trained_fidelity_ab.py  (HOCR_TRAIN_STEPS caps the
train loops; HOCR_AB_SCALE=tiny shrinks everything for a CPU smoke run).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

SMOKE = os.environ.get("HOCR_AB_SCALE") == "tiny"
REPORT = Path(__file__).parent.parent / (
    "serving_invariance_ab_tiny.json" if SMOKE
    else "serving_invariance_ab.json")
def _max_steps() -> int:
    """Train-step cap, read at CALL time: the TPU gauntlet sets
    HOCR_TRAIN_STEPS=2 mid-process, so an import-time read would be
    order-dependent (round-4 advisor finding)."""
    return int(os.environ.get("HOCR_TRAIN_STEPS", "120" if SMOKE else "3000"))


# ── deterministic page rendering (known ground truth) ─────────────────
# 5x7 bitmap font: enough glyph diversity for distinct-word pages. The
# model only needs *consistent* glyphs, not typographic fidelity.
_FONT = {
    "A": "0E11111F111111", "B": "1E11111E11111E", "C": "0E11101010110E",
    "D": "1E11111111111E", "E": "1F10101E10101F", "F": "1F10101E101010",
    "G": "0E11101711110E", "H": "1111111F111111", "I": "0E04040404040E",
    "K": "11121418141211", "L": "1010101010101F", "M": "111B1511111111",
    "N": "11191513111111", "O": "0E11111111110E", "P": "1E11111E101010",
    "R": "1E11111E141211", "S": "0F10100E01011E", "T": "1F040404040404",
    "U": "1111111111110E", "V": "11111111110A04", "W": "11111111151B11",
    "X": "11110A040A1111", "Y": "11110A04040404", "Z": "1F01020408101F",
    " ": "00000000000000", ".": "00000000000C0C",
}
_WORDS = ["THE", "RIVER", "BENDS", "OLD", "STONE", "MILL", "WHEAT",
          "HARVEST", "MOON", "LETTERS", "SENT", "HOME", "WINTER",
          "ROADS", "WERE", "MUD", "SPRING", "RAIN", "KIND", "NOTES",
          "MARKET", "PRICE", "OXEN", "TEAM"]


def _glyph(ch: str) -> np.ndarray:
    spec = _FONT.get(ch, _FONT[" "]).replace(" ", "0")
    rows = [int(spec[i:i + 2], 16) for i in range(0, 14, 2)]
    return np.array([[(r >> (4 - c)) & 1 for c in range(5)]
                     for r in rows], np.uint8)


def render_page(lines: list[str], size: int = 224, scale: int = 2,
                seed: int = 0) -> np.ndarray:
    """White-ish page with dark bitmap text; same stats family as
    bench.synthetic_pages (paper tone + dark strokes)."""
    rng = np.random.default_rng(seed)
    page = np.clip(rng.normal(235, 6, (size, size)), 200, 255)
    y = 10
    for line in lines:
        x = 8
        for ch in line:
            g = _glyph(ch)
            g = np.kron(g, np.ones((scale, scale), np.uint8))
            h, w = g.shape
            if x + w >= size - 4:
                break
            patch = page[y:y + h, x:x + w]
            page[y:y + h, x:x + w] = np.where(g > 0, 25, patch)
            x += w + scale
        y += 7 * scale + 6
        if y + 7 * scale >= size:
            break
    return np.stack([page] * 3, axis=-1).astype(np.uint8)


def make_dataset(n_pages: int, seed: int = 3):
    """(pages, texts): each page renders 4 lines of 3 bank words."""
    rng = np.random.default_rng(seed)
    pages, texts = [], []
    for i in range(n_pages):
        lines = [" ".join(rng.choice(_WORDS, 3)) for _ in range(4)]
        pages.append(render_page(lines, seed=1000 + i))
        texts.append("\n".join(lines))
    return pages, texts


# ── small tokenizer / configs (ids fit the trained vocab) ─────────────
IM_START, IM_END, VIS_START, VIS_END, IMG_PAD, PAD = 256, 257, 258, 259, 260, 261
_SPECIALS = {"<|im_start|>": IM_START, "<|im_end|>": IM_END,
             "<|vision_start|>": VIS_START, "<|vision_end|>": VIS_END,
             "<|image_pad|>": IMG_PAD}


class SmallTok:
    """Byte chars + in-vocab special ids (vocab 384)."""

    def __init__(self):
        import re
        self._pat = re.compile("|".join(map(re.escape, _SPECIALS)))

    def encode(self, text: str) -> list[int]:
        out, pos = [], 0
        for m in self._pat.finditer(text):
            out.extend(min(ord(c), 255) for c in text[pos:m.start()])
            out.append(_SPECIALS[m.group()])
            pos = m.end()
        out.extend(min(ord(c), 255) for c in text[pos:])
        return out

    def decode(self, ids) -> str:
        return "".join(chr(i) for i in ids if i < 256)


def small_vl_config():
    from handwritten_ocr_tpu.models.qwen25vl.config import (
        TextConfig, VisionConfig, VLConfig)
    depth = 2 if SMOKE else 4
    layers = 2 if SMOKE else 4
    return VLConfig(
        # Wide enough to separate every page at the FIRST target token:
        # at hidden 128 the tower got stuck in a permutation local
        # minimum (two pages swapped identities; loss plateau = exactly
        # those first tokens) and free-running decode emitted the wrong
        # page's memorized text.
        vision=VisionConfig(depth=depth, hidden_size=256,
                            intermediate_size=512, num_heads=4,
                            out_hidden_size=512,
                            fullatt_block_indexes=(depth - 1,)),
        # head_dim 128 / 4 KV heads: the fused paged kernel's alignment
        # contract (models/paged.py) — the A/B must exercise the REAL
        # production serving path, not the portable fallback.
        text=TextConfig(vocab_size=384, hidden_size=512,
                        intermediate_size=512, num_hidden_layers=layers,
                        num_attention_heads=4, num_key_value_heads=4,
                        mrope_section=(16, 24, 24)),
        image_token_id=IMG_PAD, vision_start_token_id=VIS_START,
        vision_end_token_id=VIS_END, eos_token_id=IM_END, pad_token_id=PAD)


def small_qwen3_config():
    from handwritten_ocr_tpu.models.qwen3 import Qwen3Config
    # head_dim 128 / 4 KV heads keep the fused paged kernel's alignment
    # contract (models/paged.py) so the A/B runs the production path;
    # 8:4 GQA exercises the kernel's head-group folding too.
    return Qwen3Config(vocab_size=384, hidden_size=256,
                       intermediate_size=512,
                       num_hidden_layers=2 if SMOKE else 4,
                       num_attention_heads=8, num_key_value_heads=4,
                       head_dim=128, eos_token_id=IM_END, pad_token_id=PAD)


# ── VL phase ──────────────────────────────────────────────────────────
def vl_batch(pages, texts, cfg, tok):
    """TrainBatch from in-memory pages (mirrors train/data.build_batch,
    which loads from disk paths)."""
    import jax.numpy as jnp

    from handwritten_ocr_tpu.models.processor import pack_image
    from handwritten_ocr_tpu.models.qwen25vl.model import rope_index_for_prompt
    from handwritten_ocr_tpu.train.step import TrainBatch

    packed = [pack_image(p, do_resize=False) for p in pages]
    grid = packed[0].grid
    n_llm = packed[0].num_llm_tokens
    prompt_text = ("<|im_start|>user\n<|vision_start|><|image_pad|>"
                   "<|vision_end|>Transcribe.<|im_end|>\n"
                   "<|im_start|>assistant\n")
    prompt_ids: list[int] = []
    for t in tok.encode(prompt_text):
        prompt_ids.extend([IMG_PAD] * n_llm if t == IMG_PAD else [t])

    rows, masks = [], []
    for text in texts:
        target = tok.encode(text) + [cfg.eos_token_id]
        rows.append(prompt_ids + target)
        masks.append([0.0] * len(prompt_ids) + [1.0] * len(target))
    longest = max(len(r) for r in rows)
    ids = np.full((len(rows), longest), cfg.pad_token_id, np.int32)
    mask = np.zeros((len(rows), longest), np.float32)
    for i, (r, m) in enumerate(zip(rows, masks)):
        ids[i, :len(r)] = r
        mask[i, :len(r)] = m
    positions = np.stack([rope_index_for_prompt(ids[i], cfg, [grid])[0]
                          for i in range(len(rows))], axis=1)
    patches = np.stack([p.patches for p in packed])
    batch = TrainBatch(input_ids=jnp.asarray(ids),
                       patches=jnp.asarray(patches),
                       position_ids=jnp.asarray(positions),
                       loss_mask=jnp.asarray(mask))
    return batch, grid, np.asarray(prompt_ids, np.int32), len(prompt_ids)


def cast_bf16(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)


def run_vl_phase(report: dict) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from handwritten_ocr_tpu.engine.serving import (ContinuousBatcher,
                                                    GenRequest, PagedProgram)
    from handwritten_ocr_tpu.models.init import init_vl
    from handwritten_ocr_tpu.models.quant import quantize_tree
    from handwritten_ocr_tpu.models.qwen25vl.language import (lm_logits,
                                                              text_forward)
    from handwritten_ocr_tpu.models.qwen25vl.model import VLModel
    from handwritten_ocr_tpu.text.metrics import tier1_metrics
    from handwritten_ocr_tpu.train.step import (make_train_step,
                                                next_token_loss, vl_forward)

    tok = SmallTok()
    cfg = small_vl_config()
    n_pages = 4 if SMOKE else 16
    pages, texts = make_dataset(n_pages)
    batch, grid, prompt_ids, prompt_len = vl_batch(pages, texts, cfg, tok)
    max_target = int(batch.input_ids.shape[1]) - prompt_len

    # Train in f32 (the production train step; serving casts to bf16).
    params = init_vl(jax.random.PRNGKey(11), cfg, dtype=jnp.float32)
    peak_lr = float(os.environ.get("HOCR_TRAIN_LR", "1e-3"))
    # Cosine decay anneals past the permutation plateau (constant 1e-3
    # oscillated at loss ~0.02 = two misidentified first tokens).
    max_steps = _max_steps()
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup_steps=min(100, max(1, max_steps // 4)),
        decay_steps=max_steps, end_value=peak_lr / 20)
    init_opt, train_step = make_train_step(cfg, grid, optax.adamw(schedule))
    opt_state = init_opt(params)
    t0 = time.perf_counter()
    loss = float("nan")
    for step in range(max_steps):
        params, opt_state, loss = train_step(params, opt_state, batch)
        if step % 200 == 0 or step == max_steps - 1:
            loss = float(loss)
            print(f"[vl-train] step {step} loss {loss:.4f}", flush=True)
            if loss < 0.002:   # every first token nailed, margins wide
                break
    train_s = time.perf_counter() - t0
    final_loss = float(loss)

    params_bf16 = cast_bf16(params)
    params_int8 = quantize_tree(params_bf16)
    del params, opt_state

    # Teacher-forced margins at the target positions (bf16 weights) and
    # the int8 logit perturbation those margins must beat.
    @jax.jit
    def tf_logits(p):
        return vl_forward(p, cfg, batch.input_ids, batch.patches, grid,
                          batch.position_ids)

    logits_bf16 = np.asarray(tf_logits(params_bf16), np.float32)
    logits_int8 = np.asarray(tf_logits(params_int8), np.float32)
    tgt_mask = np.asarray(batch.loss_mask[:, 1:]) > 0
    pred_pos = np.where(tgt_mask)                     # positions PREDICTING targets
    lt = logits_bf16[:, :-1][pred_pos]
    top2 = np.sort(lt, axis=-1)[:, -2:]
    margins = top2[:, 1] - top2[:, 0]
    perturb = np.abs((logits_int8 - logits_bf16)[:, :-1][pred_pos])

    # Dense-tiling noise at THIS scale (batch-N vs batch-1 logits).
    @jax.jit
    def tf_rows(p, ids, patches, pos):
        return vl_forward(p, cfg, ids, patches, grid, pos)

    l_b1 = np.asarray(tf_rows(params_bf16, batch.input_ids[:1],
                              batch.patches[:1], batch.position_ids[:, :1]),
                      np.float32)
    noise = float(np.abs(logits_bf16[0] - l_b1[0]).max())

    # Greedy transcription A/B: dense bf16 vs dense int8 weights.
    def dense_texts(p):
        model = VLModel(p, cfg)
        ids = np.tile(prompt_ids, (n_pages, 1))
        gen = model.generate(ids, batch.patches, grid, max_target)
        tokens = np.asarray(gen.tokens)
        lengths = np.asarray(gen.lengths)
        return [tokens[i, :lengths[i]].tolist() for i in range(n_pages)]

    out_bf16 = dense_texts(params_bf16)
    out_int8 = dense_texts(params_int8)
    txt_bf16 = [tok.decode(t) for t in out_bf16]
    txt_int8 = [tok.decode(t) for t in out_int8]
    cer_bf16 = float(np.mean([tier1_metrics(t, g)["cer"]
                              for t, g in zip(txt_bf16, texts)]))
    cer_int8 = float(np.mean([tier1_metrics(t, g)["cer"]
                              for t, g in zip(txt_int8, texts)]))
    identical = sum(a == b for a, b in zip(out_bf16, out_int8))

    # The SHIPPED serving path (paged + int8 KV + int8 weights) vs dense.
    from handwritten_ocr_tpu.models.qwen25vl.model import rope_index_for_prompt
    positions, delta = rope_index_for_prompt(prompt_ids, cfg, [grid])
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    program = PagedProgram(params_int8["text"], cfg.text,
                           eos_token_id=cfg.eos_token_id)
    batcher = ContinuousBatcher(
        program, n_slots=min(8, n_pages), block_size=128,
        max_context=prompt_len + max_target, chunk=8, dtype=dtype,
        kv_quant=not SMOKE)
    model_int8 = VLModel(params_int8, cfg)
    embeds = model_int8.prompt_embeds(
        params_int8, jnp.asarray(np.tile(prompt_ids, (n_pages, 1))),
        batch.patches, grid)
    paged_out = batcher.run([
        GenRequest(prompt_ids, max_target, positions=positions,
                   rope_delta=delta, embeds=embeds[i])
        for i in range(n_pages)])
    paged_identical = sum(list(a) == list(b)
                          for a, b in zip(paged_out, out_int8))

    report["weights_int8_vs_bf16_trained"] = {
        "what": "tiny-VL TRAINED on rendered pages (train/step.py, "
                f"{final_loss:.4f} final loss, {train_s:.0f}s): dense "
                "greedy bf16 weights vs int8 weights (quantize_tree), "
                "plus the shipped paged/int8-KV path vs dense",
        "pages": n_pages,
        "train_steps": max_steps, "final_loss": round(final_loss, 4),
        "greedy_margin_min": round(float(margins.min()), 4),
        "greedy_margin_median": round(float(np.median(margins)), 4),
        "tiling_noise_max_abs_logit": round(noise, 5),
        "int8_logit_perturb_median": round(float(np.median(perturb)), 5),
        "int8_logit_perturb_max": round(float(perturb.max()), 5),
        "pages_identical_int8_vs_bf16": identical,
        "token_agreement_int8_vs_bf16": round(float(np.mean(
            [sum(x == y for x, y in zip(a, b)) / max(len(a), len(b), 1)
             for a, b in zip(out_bf16, out_int8)])), 4),
        "cer_vs_ground_truth_bf16": round(cer_bf16, 4),
        "cer_vs_ground_truth_int8": round(cer_int8, 4),
        "paged_int8kv_pages_identical_vs_dense": paged_identical,
        "margin_over_perturb_ratio_median": round(
            float(np.median(margins) / max(np.median(perturb), 1e-9)), 1),
    }
    print(json.dumps(report["weights_int8_vs_bf16_trained"], indent=2),
          flush=True)


# ── LM phase: speculation acceptance on trained weights ──────────────
def copy_text(rng, length: int) -> str:
    s = ""
    while len(s) < length:
        s += str(rng.choice(_WORDS)).lower() + " "
    return s[:length]


def train_lm_copy(cfg, steps: int, *, length: int, batch: int,
                  tok, seed: int = 5, stop_loss: float = 0.01):
    """Train the COPY task the reference's speculation workload has:
    rows are ``text <SEP> text`` with loss on the copy half only. The
    editor/arbitrator calls this machinery accelerates return the page
    almost verbatim (ref agents.py:213-241 'COMPLETE corrected text'),
    i.e. the source occurs ONCE in the prompt and the output copies it —
    exactly the regime where prompt-lookup drafting fires. A model
    trained to copy has near-one margins at every copied position
    (induction), so greedy outputs are schedule-noise-proof."""
    import jax
    import jax.numpy as jnp
    import optax

    from handwritten_ocr_tpu.models.init import init_qwen3
    from handwritten_ocr_tpu.models.qwen25vl.language import (lm_logits,
                                                              text_forward)

    params = init_qwen3(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)

    # Targets at index j predict ids[:, j+1]; the copy half is the
    # tokens after the SEP at index `length`.
    copy_mask = (np.arange(2 * length) >= length).astype(np.float32)[None]
    copy_mask_j = jnp.asarray(copy_mask)

    def loss_fn(p, ids):
        embeds = p["embed"]["w"][ids]
        pos = jnp.broadcast_to(jnp.arange(ids.shape[1])[None], ids.shape)
        hidden, _ = text_forward(p, cfg, embeds, pos, None)
        logits = lm_logits(p, cfg, hidden)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        picked = jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
        return -(picked * copy_mask_j).sum() / (copy_mask_j.sum() * ids.shape[0])

    @jax.jit
    def step_fn(p, s, ids):
        loss, grads = jax.value_and_grad(loss_fn)(p, ids)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    rng = np.random.default_rng(seed)
    loss = float("nan")
    for step in range(steps):
        rows = []
        for _ in range(batch):
            ids = tok.encode(copy_text(rng, length))
            rows.append(ids + [IM_START] + ids)
        ids = jnp.asarray(np.asarray(rows, np.int32))
        params, opt_state, loss = step_fn(params, opt_state, ids)
        if step % 100 == 0 or step == steps - 1:
            loss = float(loss)
            print(f"[lm-train] step {step} copy loss {loss:.4f}", flush=True)
            if loss < stop_loss:
                break
    return params, float(loss)


def run_lm_phase(report: dict, *, smoke: bool | None = None) -> None:
    """Speculation + int8-weight A/B on a TRAINED Qwen3 through the
    production batcher. ``smoke`` shrinks every knob for CPU runs;
    bench.py reuses this with smoke = (backend == cpu)."""
    import jax
    import jax.numpy as jnp

    from handwritten_ocr_tpu.engine.serving import (ContinuousBatcher,
                                                    GenRequest, PagedProgram)
    from handwritten_ocr_tpu.models.quant import quantize_tree

    if smoke is None:
        smoke = SMOKE
    tok = SmallTok()
    cfg = small_qwen3_config()
    length = 48 if smoke else 224
    steps = min(_max_steps(), 120 if smoke else 1500)
    params, final_loss = train_lm_copy(cfg, steps, length=length,
                                       batch=4 if smoke else 8, tok=tok)
    params_bf16 = cast_bf16(params)
    params_int8 = quantize_tree(params_bf16)
    del params

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    n_req = 2 if smoke else 8
    budget = length
    # UNSEEN word orders (train uses seed 5): the copy skill must
    # generalize, exactly like the editor copying a fresh page.
    rng = np.random.default_rng(17)
    sources = [copy_text(rng, length) for _ in range(n_req)]
    prompts = [np.asarray(tok.encode(s) + [IM_START], np.int32)
               for s in sources]
    max_ctx = max(len(p) for p in prompts) + budget + 64

    def run(p_tree, speculate):
        program = PagedProgram(p_tree, cfg, eos_token_id=-1)
        batcher = ContinuousBatcher(program, n_slots=n_req, block_size=128,
                                    max_context=max_ctx, chunk=8,
                                    dtype=dtype, kv_quant=not smoke)
        reqs = [GenRequest(p, budget, speculate=speculate) for p in prompts]
        t0 = time.perf_counter()
        out = batcher.run(reqs)
        return out, time.perf_counter() - t0, dict(batcher.spec_stats)

    run(params_int8, False)                       # compile + warm (plain)
    run(params_int8, True)                        # compile + warm (verify
    #                                               blocks + draft shapes —
    #                                               spec pays extra programs)
    out_plain, plain_s, _ = run(params_int8, False)
    out_spec, spec_s, stats = run(params_int8, True)
    out_bf16, _, _ = run(params_bf16, False)

    total = sum(len(t) for t in out_plain)
    agree_spec = float(np.mean(
        [sum(x == y for x, y in zip(a, b)) / max(len(a), len(b), 1)
         for a, b in zip(out_spec, out_plain)]))
    agree_w = float(np.mean(
        [sum(x == y for x, y in zip(a, b)) / max(len(a), len(b), 1)
         for a, b in zip(out_bf16, out_plain)]))
    from handwritten_ocr_tpu.text.metrics import tier1_metrics
    copy_cer = float(np.mean([
        tier1_metrics(tok.decode(t), s)["cer"]
        for t, s in zip(out_plain, sources)]))
    copies_exact = sum(tok.decode(t) == s
                       for t, s in zip(out_plain, sources))
    report["speculation_trained"] = {
        "what": "tiny Qwen3 TRAINED to copy (text <SEP> text — the "
                "editor/arbitrator verbatim-copy shape speculation "
                "accelerates, ref agents.py:213-241), production "
                "ContinuousBatcher (int8 weights%s): prompt-lookup "
                "speculation vs plain decode on UNSEEN texts" % (
                    "" if smoke else " + int8 KV"),
        "train_steps": steps, "final_loss": round(final_loss, 4),
        "requests": n_req, "budget": budget,
        "copy_cer_vs_source": round(copy_cer, 4),
        "copies_exact": copies_exact,
        "spec_stats": stats,
        "acceptance_rate": round(stats["accepted"]
                                 / max(stats["drafted"], 1), 3),
        "tokens_per_sec_plain": round(total / plain_s, 1),
        "tokens_per_sec_spec": round(sum(len(t) for t in out_spec) / spec_s,
                                     1),
        "net_speedup": round(plain_s / spec_s, 2),
        "token_agreement_spec_vs_plain": round(agree_spec, 4),
        "token_agreement_int8_vs_bf16_weights": round(agree_w, 4),
    }

    # Guided (schema-constrained) surface with the SAME trained weights:
    # the production agent path drafts only inside string value spans
    # (serving.string_verify_round); scaffold tokens are forced, so the
    # copy skill drives the span. Round-4 verdict #3 asked for this cell
    # — the random-weight guided A/B accepted 0/144 because drafts never
    # matched; trained weights measure the real in-span acceptance.
    schema = {"type": "object",
              "properties": {"text": {"type": "string"}},
              "required": ["text"]}

    def run_guided(speculate):
        program = PagedProgram(params_int8, cfg, eos_token_id=-1)
        batcher = ContinuousBatcher(program, n_slots=n_req, block_size=128,
                                    max_context=max_ctx + 32, chunk=8,
                                    dtype=dtype, kv_quant=not smoke)
        reqs = [GenRequest(p, budget + 8, speculate=speculate)
                for p in prompts]
        t0 = time.perf_counter()
        out = batcher.run_guided(reqs, schema, tok)
        return out, time.perf_counter() - t0, dict(batcher.spec_stats)

    run_guided(True)                          # compile + warm
    out_gs, gs_s, g_stats = run_guided(True)
    out_gp, gp_s, _ = run_guided(False)
    objects_equal = sum((a or {}) == (b or {})
                        for (a, _), (b, _) in zip(out_gs, out_gp))
    report["speculation_trained"]["guided_trained"] = {
        "what": "schema-constrained agent surface (run_guided, forced "
                "scaffold + free string spans), trained copy model: "
                "in-span prompt-lookup speculation vs plain guided",
        "requests": n_req,
        "complete": sum(c for _, c in out_gs),
        "spec_stats": g_stats,
        "acceptance_rate": round(
            g_stats["accepted"] / max(g_stats["drafted"], 1), 3),
        "net_speedup": round(gp_s / gs_s, 2),
        "objects_equal_spec_vs_plain": objects_equal,
    }
    print(json.dumps(report["speculation_trained"], indent=2), flush=True)


def main() -> None:
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = Path(__file__).parent.parent / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    report = json.loads(REPORT.read_text()) if REPORT.exists() else {}
    run_vl_phase(report)
    REPORT.write_text(json.dumps(report, indent=2) + "\n")
    run_lm_phase(report)
    REPORT.write_text(json.dumps(report, indent=2) + "\n")
    print(f"wrote {REPORT}")


if __name__ == "__main__":
    main()
