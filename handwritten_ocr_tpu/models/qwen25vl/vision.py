"""Windowed ViT encoder (Qwen2.5-VL vision tower) — batched, static shapes.

TPU-first redesign of the HF reference encoder (which runs one concatenated
varlen sequence with per-chunk python splits): a batch of B images with
*identical* grids — exactly the multi-strategy-reads-of-one-page case —
runs as [B, P, D] in **padded window layout**: tokens live grouped into
uniform windows (edge windows padded with dead slots) for the whole stack,
so the 28 window-attention layers are pure reshapes + masked attention
with ZERO gather/scatter traffic (profiled at ~5 ms/layer before). The
four global-attention layers run the Pallas flash kernel with a dead-slot
key mask. One gather enters the layout after patch embedding; one gather
leaves it before the patch merger.

All permutations / rotary tables / masks are precomputed host-side per
grid (a handful of numpy ops, cached); the jitted forward recompiles only
when the grid changes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from handwritten_ocr_tpu.models.layers import (
    apply_rope,
    attention,
    linear,
    rms_norm,
    swiglu_mlp,
)
from handwritten_ocr_tpu.models.qwen25vl.config import VisionConfig

_NORM_EPS = 1e-6  # vision blocks use fixed 1e-6 (HF Qwen2RMSNorm(eps=1e-6))


@dataclasses.dataclass(frozen=True)
class GridPlan:
    """Host-precomputed static layout for one (t, h, w) patch grid."""

    grid: tuple[int, int, int]
    cell_perm: np.ndarray          # [n_cells] window-order permutation of 2x2 cells
    cell_unperm: np.ndarray        # [n_cells] inverse permutation
    n_windows: int
    window_len: int
    pad_from_flat: np.ndarray      # [P] permuted-token source per padded slot
    valid: np.ndarray              # [P] bool: real token (not a dead slot)
    flat_from_win: np.ndarray      # [S] permuted position -> padded slot
    cos_pad: np.ndarray            # [P, head_dim] rotary cos (padded layout)
    sin_pad: np.ndarray            # [P, head_dim] rotary sin (padded layout)


@functools.lru_cache(maxsize=32)
def plan_grid(cfg: VisionConfig, grid: tuple[int, int, int]) -> GridPlan:
    """Precompute permutations, padded-window layout, and rotary tables."""
    t, h, w = grid
    merge = cfg.spatial_merge_size
    unit = cfg.spatial_merge_unit
    cells_h, cells_w = h // merge, w // merge
    n_cells = t * cells_h * cells_w
    seq_len = t * h * w

    # Window partition of the cell grid (vit merger windows), edge windows
    # smaller. Matches HF get_window_index (modeling_qwen2_5_vl.py:365-404);
    # HF pads by (win - size % win) even when aligned — all-empty windows
    # are dropped, as unique_consecutive does there.
    win_cells = cfg.window_size // merge // cfg.patch_size
    pad_h = win_cells - cells_h % win_cells
    pad_w = win_cells - cells_w % win_cells
    n_win_h = (cells_h + pad_h) // win_cells
    n_win_w = (cells_w + pad_w) // win_cells

    cell_index = np.arange(n_cells).reshape(t, cells_h, cells_w)
    padded = np.full((t, cells_h + pad_h, cells_w + pad_w), -1, dtype=np.int64)
    padded[:, :cells_h, :cells_w] = cell_index
    padded = (
        padded.reshape(t, n_win_h, win_cells, n_win_w, win_cells)
        .transpose(0, 1, 3, 2, 4)
        .reshape(t * n_win_h * n_win_w, win_cells * win_cells)
    )
    window_cell_lists = [row[row >= 0] for row in padded if (row >= 0).any()]
    cell_perm = np.concatenate(window_cell_lists)
    cell_unperm = np.argsort(cell_perm)

    # Padded window layout: every window spans window_len slots; a window's
    # valid tokens occupy its first len(cells)*unit slots.
    window_len = win_cells * win_cells * unit
    n_windows = len(window_cell_lists)
    total = n_windows * window_len
    pad_from_flat = np.zeros(total, dtype=np.int64)
    valid = np.zeros(total, dtype=bool)
    flat_from_win = np.zeros(seq_len, dtype=np.int64)
    offset = 0
    for wi, cells in enumerate(window_cell_lists):
        n_tok = len(cells) * unit
        token_ids = np.arange(offset, offset + n_tok)
        slots = wi * window_len + np.arange(n_tok)
        pad_from_flat[slots] = token_ids
        valid[slots] = True
        flat_from_win[token_ids] = slots
        offset += n_tok

    # 2D rotary table in cell-major patch order, then placed into the
    # padded layout. (HF rot_pos_emb: h/w ids arranged cell-major.)
    hpos = np.arange(h)[:, None].repeat(w, axis=1)
    wpos = np.arange(w)[None, :].repeat(h, axis=0)

    def cell_major(x: np.ndarray) -> np.ndarray:
        return (x.reshape(cells_h, merge, cells_w, merge)
                 .transpose(0, 2, 1, 3).reshape(-1))

    hpos_ids = np.tile(cell_major(hpos), t)
    wpos_ids = np.tile(cell_major(wpos), t)

    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, half, 2, dtype=np.float64) / half))
    freq_h = hpos_ids[:, None] * inv_freq[None, :]
    freq_w = wpos_ids[:, None] * inv_freq[None, :]
    rot = np.concatenate([freq_h, freq_w], axis=-1)        # [S, head_dim/2]
    emb = np.concatenate([rot, rot], axis=-1)              # [S, head_dim]
    token_perm = (cell_perm[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    cos_perm = np.cos(emb)[token_perm].astype(np.float32)
    sin_perm = np.sin(emb)[token_perm].astype(np.float32)
    cos_pad = np.zeros((total, cfg.head_dim), np.float32)
    sin_pad = np.zeros((total, cfg.head_dim), np.float32)
    cos_pad[flat_from_win] = cos_perm
    sin_pad[flat_from_win] = sin_perm

    return GridPlan(
        grid=grid,
        cell_perm=cell_perm,
        cell_unperm=cell_unperm,
        n_windows=n_windows,
        window_len=window_len,
        pad_from_flat=pad_from_flat,
        valid=valid,
        flat_from_win=flat_from_win,
        cos_pad=cos_pad,
        sin_pad=sin_pad,
    )


def _split_qkv(params: dict, x: jax.Array, num_heads: int) -> tuple[jax.Array, ...]:
    """Packed qkv projection -> per-head q, k, v."""
    *lead, _ = x.shape
    fused = linear(params["qkv"], x)
    q, k, v = jnp.split(fused, 3, axis=-1)
    shape = (*lead, num_heads, -1)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)


def _attend_full(params: dict, cfg: VisionConfig, x: jax.Array,
                 cos: jax.Array, sin: jax.Array,
                 kv_mask: jax.Array) -> jax.Array:
    """Global attention over the padded sequence (dead slots key-masked)."""
    from handwritten_ocr_tpu.ops.dispatch import flash_mode

    q, k, v = _split_qkv(params, x, cfg.num_heads)
    q, k = apply_rope(q, k, cos[None, :, None, :], sin[None, :, None, :])
    mode = flash_mode()
    if mode != "off":
        from handwritten_ocr_tpu.ops.flash_attention import flash_attention
        # Full-K blocks with a short q block win at page-grid lengths:
        # one kv pass per q block amortizes the per-step fp32 softmax
        # glue (block sweep at the 3456-token bench grid: 512x512 auto
        # 25.8 -> 1024x1024 21.3 -> 256xfullK 16.8 ms/layer; 384 and 128
        # within noise of 256).  The q block is bounded by a BYTE budget
        # so the fp32 [bq, S] score temporaries plus the dtype-scaled
        # k/v/q blocks stay inside scoped VMEM whatever the input dtype
        # (512xfullK at bf16 compiled to 18.2M > 16M — the model below
        # reproduces that number; rows-only caps broke at f32 in r3).
        s_pad = -(-x.shape[1] // 128) * 128
        isz = q.dtype.itemsize
        lanes = max(cfg.head_dim, 128)
        kv_bytes = 4 * s_pad * lanes * isz       # k+v, double-buffered
        per_bq = 2 * s_pad * 4 + 4 * lanes * isz  # scores fp32 + q/out
        bq = max(0, (14_000_000 - kv_bytes) // per_bq) // 128 * 128
        if bq >= 128:
            block_q, block_k = min(384, bq, s_pad), s_pad
        else:                                  # very long seq: tiled kv
            block_q = block_k = 1024
        out = flash_attention(q, k, v, kv_mask, scale=cfg.head_dim ** -0.5,
                              block_q=block_q, block_k=block_k,
                              interpret=(mode == "interpret"))
    else:
        mask = kv_mask[None, None, None, :]
        out = attention(q, k, v, mask=mask, scale=cfg.head_dim ** -0.5)
    return linear(params["proj"], out.reshape(*x.shape[:-1], -1))


def _attend_windows(params: dict, cfg: VisionConfig, x: jax.Array,
                    cos_w: jax.Array, sin_w: jax.Array,
                    win_valid: jax.Array) -> jax.Array:
    """Attention within uniform windows — pure reshapes, no gathers.

    Two paths:
      * Pallas fused multi-window kernel (default on TPU): chunks of
        whole windows per grid step, rope in-kernel, packed-qkv reads,
        scores kept in VMEM (ops/window_attention.py). The einsum path's
        materialized [B, n_win, H, L, L] fp32 scores profiled at
        3.1 ms/layer (1.5% MFU) — pure HBM traffic this kernel removes.
        (Folding windows ONE at a time into the flash kernel was the
        measured-slow round-2 dead end: thousands of 256-token
        instances; the chunked kernel uses ~48 instances/layer.)
      * batched einsum fallback (CPU / HOCR_TPU_WINATTN=0).
    """
    from handwritten_ocr_tpu.ops.dispatch import (window_attention_layout,
                                                  window_attention_mode)

    b, p, _ = x.shape
    n_win, win_len = win_valid.shape
    mode = window_attention_mode()
    if mode != "off":
        from handwritten_ocr_tpu.ops.window_attention import window_attention
        fused = linear(params["qkv"], x)                   # [B, P, 3D]
        out = window_attention(
            fused,
            cos_w.reshape(n_win * win_len, -1),
            sin_w.reshape(n_win * win_len, -1),
            win_valid.reshape(-1),
            num_heads=cfg.num_heads,
            window_len=win_len,
            scale=cfg.head_dim ** -0.5,
            interpret=(mode == "interpret"),
            packed=(window_attention_layout() == "packed"),
        )
        return linear(params["proj"], out)

    xw = x.reshape(b, n_win, win_len, -1)
    q, k, v = _split_qkv(params, xw, cfg.num_heads)        # [B, n_win, L, H, hd]
    q, k = apply_rope(q, k,
                      cos_w[None, :, :, None, :], sin_w[None, :, :, None, :])
    scale = cfg.head_dim ** -0.5
    scores = jnp.einsum("bwthd,bwshd->bwhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = win_valid[None, :, None, None, :]               # keys masked
    scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bwhts,bwshd->bwthd", weights, v)
    return linear(params["proj"], out.reshape(b, p, -1))


def vision_encode(params: dict, cfg: VisionConfig, patches: jax.Array,
                  grid: tuple[int, int, int]) -> jax.Array:
    """Encode a batch of identically-gridded images.

    patches: [B, S, C*T*ps*ps] in HF processor patch order (cell-major).
    Returns merged image embeddings [B, S/merge_unit, out_hidden_size]
    in the original (unpermuted) cell order.
    """
    plan = plan_grid(cfg, tuple(int(g) for g in grid))
    b, s, _ = patches.shape
    unit = cfg.spatial_merge_unit

    # The tower runs in the PARAMETER dtype. The device pack path emits
    # f32 patches (processor.pack_image_device); without this cast the
    # mixed matmul silently promotes the entire 32-layer stack to f32 —
    # 2x HBM traffic, quarter-rate MXU, and f32 Pallas blocks that blew
    # the window kernel's VMEM budget at the bench grid (round-3 crash).
    x = patches.astype(params["patch_embed"]["w"].dtype) \
        @ params["patch_embed"]["w"]                       # [B, S, D]

    # Cell-level window permutation, then ONE gather into padded layout.
    x = x.reshape(b, s // unit, unit, -1)
    x = x[:, jnp.asarray(plan.cell_perm)].reshape(b, s, -1)
    valid = jnp.asarray(plan.valid)
    x = x[:, jnp.asarray(plan.pad_from_flat)] * valid[:, None].astype(x.dtype)

    cos = jnp.asarray(plan.cos_pad)
    sin = jnp.asarray(plan.sin_pad)
    n_win, win_len = plan.n_windows, plan.window_len
    win_valid = valid.reshape(n_win, win_len)
    cos_w = cos.reshape(n_win, win_len, -1)
    sin_w = sin.reshape(n_win, win_len, -1)

    full_layers = set(cfg.fullatt_block_indexes)
    blocks = params["blocks"]

    def window_layer(x, layer):
        normed = rms_norm(layer["norm1"], x, _NORM_EPS)
        x = x + _attend_windows(layer["attn"], cfg, normed,
                                cos_w, sin_w, win_valid)
        return x + swiglu_mlp(layer["mlp"],
                              rms_norm(layer["norm2"], x, _NORM_EPS))

    def full_layer(x, layer):
        normed = rms_norm(layer["norm1"], x, _NORM_EPS)
        x = x + _attend_full(layer["attn"], cfg, normed, cos, sin, valid)
        return x + swiglu_mlp(layer["mlp"],
                              rms_norm(layer["norm2"], x, _NORM_EPS))

    if isinstance(blocks, dict):
        # Stacked layout: lax.scan over each contiguous run of window
        # layers, full-attention layers applied singly between runs.
        # ~8 traced layer bodies instead of a depth-times unrolled graph
        # (cold XLA compile on a 1-core host is what gates the driver
        # bench window). Two HBM-pressure lessons are baked in — the
        # chip's usable HBM next to the int8 7B params is tight:
        #   * segments rather than one scan+cond (a cond in the body
        #     unioned both branches' workspace);
        #   * the scan runs over an INDEX array with an in-body dynamic
        #     gather of the layer slice, not over tree slices
        #     ``a[start:stop]`` — those materialized per-segment weight
        #     copies (~0.6 GB at 7B) in the program's temp arena.
        depth = jax.tree_util.tree_leaves(blocks)[0].shape[0]

        def window_scan_body(x, idx):
            layer = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, idx, keepdims=False), blocks)
            return window_layer(x, layer), None

        boundaries = sorted(i for i in full_layers if i < depth)
        start = 0
        for boundary in boundaries + [depth]:
            if boundary > start:
                x, _ = jax.lax.scan(window_scan_body, x,
                                    jnp.arange(start, boundary))
            if boundary < depth:
                layer = jax.tree_util.tree_map(
                    lambda a: a[boundary], blocks)
                x = full_layer(x, layer)
            start = boundary + 1
    else:                                       # legacy per-layer list
        for i, layer in enumerate(blocks):
            x = (full_layer if i in full_layers else window_layer)(x, layer)

    # ONE gather back to the permuted (unpadded) order, then the merger:
    # RMSNorm at patch level, fold each cell's `unit` patches, MLP to LM width.
    x = x[:, jnp.asarray(plan.flat_from_win)]
    merger = params["merger"]
    x = rms_norm(merger["ln_q"], x, _NORM_EPS)
    x = x.reshape(b, s // unit, unit * x.shape[-1])
    x = linear(merger["fc2"], jax.nn.gelu(linear(merger["fc1"], x), approximate=False))

    # Undo the window permutation (cell level).
    return x[:, jnp.asarray(plan.cell_unperm)]
