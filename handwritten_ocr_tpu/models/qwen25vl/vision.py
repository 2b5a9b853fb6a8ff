"""Windowed ViT encoder (Qwen2.5-VL vision tower) — batched, static shapes.

TPU-first redesign of the HF reference encoder (which runs one concatenated
varlen sequence with per-chunk python splits): here a batch of B images with
*identical* grids — exactly the multi-strategy-reads-of-one-page case —
runs as [B, S, D] with static shapes. Window attention executes as a
gather into uniform [n_windows, window_len] blocks (padded at the grid
edge) so scores are O(S·w) instead of O(S²); the four full-attention
layers attend globally per image.

All permutations / rotary tables / window gathers are precomputed host-side
per grid (a handful of numpy ops, cached) and passed in as device arrays;
the jitted forward recompiles only when the grid changes.
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
    win_gather: np.ndarray         # [n_win, win_len] permuted-token index (0-padded)
    win_valid: np.ndarray          # [n_win, win_len] bool padding mask
    flat_from_win: np.ndarray      # [S] flat permuted position -> win*win_len + slot
    cos: np.ndarray                # [S, head_dim] rotary cos (permuted order)
    sin: np.ndarray                # [S, head_dim] rotary sin (permuted order)


@functools.lru_cache(maxsize=32)
def plan_grid(cfg: VisionConfig, grid: tuple[int, int, int]) -> GridPlan:
    """Precompute permutations, window gathers, and rotary tables for a grid."""
    t, h, w = grid
    merge = cfg.spatial_merge_size
    unit = cfg.spatial_merge_unit
    cells_h, cells_w = h // merge, w // merge
    n_cells = t * cells_h * cells_w
    seq_len = t * h * w

    # Window partition of the cell grid (vit merger windows), edge windows
    # smaller. Matches HF get_window_index (modeling_qwen2_5_vl.py:365-404).
    win_cells = cfg.window_size // merge // cfg.patch_size
    # HF pads by (win - size % win) even when already aligned (the resulting
    # all-empty windows are dropped below, as unique_consecutive does in HF).
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

    # Token-level window gather over the *permuted* flat sequence.
    win_len = win_cells * win_cells * unit
    n_win = len(window_cell_lists)
    win_gather = np.zeros((n_win, win_len), dtype=np.int64)
    win_valid = np.zeros((n_win, win_len), dtype=bool)
    flat_from_win = np.zeros(seq_len, dtype=np.int64)
    offset = 0
    for wi, cells in enumerate(window_cell_lists):
        n_tok = len(cells) * unit
        token_ids = np.arange(offset, offset + n_tok)
        win_gather[wi, :n_tok] = token_ids
        win_valid[wi, :n_tok] = True
        flat_from_win[token_ids] = wi * win_len + np.arange(n_tok)
        offset += n_tok

    # 2D rotary table in cell-major patch order, then cell-permuted.
    # (HF rot_pos_emb: h/w ids arranged cell-major via the merge reshape.)
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
    # Apply the cell permutation at token level.
    token_perm = (cell_perm[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    cos = np.cos(emb)[token_perm].astype(np.float32)
    sin = np.sin(emb)[token_perm].astype(np.float32)

    return GridPlan(
        grid=grid,
        cell_perm=cell_perm,
        cell_unperm=cell_unperm,
        win_gather=win_gather,
        win_valid=win_valid,
        flat_from_win=flat_from_win,
        cos=cos,
        sin=sin,
    )


def _split_qkv(params: dict, x: jax.Array, num_heads: int) -> tuple[jax.Array, ...]:
    """Packed qkv projection -> per-head q, k, v."""
    *lead, _ = x.shape
    fused = linear(params["qkv"], x)
    q, k, v = jnp.split(fused, 3, axis=-1)
    shape = (*lead, num_heads, -1)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)


def _attend_full(params: dict, cfg: VisionConfig, x: jax.Array,
                 cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Global attention over the whole image sequence."""
    from handwritten_ocr_tpu.ops.dispatch import flash_mode

    q, k, v = _split_qkv(params, x, cfg.num_heads)
    q, k = apply_rope(q, k, cos[None, :, None, :], sin[None, :, None, :])
    mode = flash_mode()
    if mode != "off":
        from handwritten_ocr_tpu.ops.flash_attention import flash_attention
        out = flash_attention(q, k, v, scale=cfg.head_dim ** -0.5,
                              interpret=(mode == "interpret"))
    else:
        out = attention(q, k, v, mask=None, scale=cfg.head_dim ** -0.5)
    return linear(params["proj"], out.reshape(*x.shape[:-1], -1))


def _attend_windows(params: dict, cfg: VisionConfig, x: jax.Array,
                    cos_w: jax.Array, sin_w: jax.Array,
                    win_gather: jax.Array, win_valid: jax.Array,
                    flat_from_win: jax.Array) -> jax.Array:
    """Attention within uniform gathered windows (edge windows padded)."""
    b, s, d = x.shape
    xw = x[:, win_gather]                                  # [B, n_win, L, D]
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
    out = out.reshape(b, win_gather.shape[0] * win_gather.shape[1], -1)
    out = out[:, flat_from_win]                            # back to flat order
    return linear(params["proj"], out)


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

    x = patches @ params["patch_embed"]["w"]               # [B, S, D]

    # Cell-level window permutation (tokens within a cell stay together).
    x = x.reshape(b, s // unit, unit, -1)
    x = x[:, jnp.asarray(plan.cell_perm)].reshape(b, s, -1)

    cos = jnp.asarray(plan.cos)
    sin = jnp.asarray(plan.sin)
    win_gather = jnp.asarray(plan.win_gather)
    win_valid = jnp.asarray(plan.win_valid)
    flat_from_win = jnp.asarray(plan.flat_from_win)
    cos_w, sin_w = cos[win_gather], sin[win_gather]

    full_layers = set(cfg.fullatt_block_indexes)
    for i, layer in enumerate(params["blocks"]):
        normed = rms_norm(layer["norm1"], x, _NORM_EPS)
        if i in full_layers:
            attn_out = _attend_full(layer["attn"], cfg, normed, cos, sin)
        else:
            attn_out = _attend_windows(layer["attn"], cfg, normed, cos_w, sin_w,
                                       win_gather, win_valid, flat_from_win)
        x = x + attn_out
        x = x + swiglu_mlp(layer["mlp"], rms_norm(layer["norm2"], x, _NORM_EPS))

    # Patch merger: RMSNorm at patch level, then fold each cell's `unit`
    # patches into one vector and MLP to the LM width.
    merger = params["merger"]
    x = rms_norm(merger["ln_q"], x, _NORM_EPS)
    x = x.reshape(b, s // unit, unit * x.shape[-1])
    x = linear(merger["fc2"], jax.nn.gelu(linear(merger["fc1"], x), approximate=False))

    # Undo the window permutation (cell level).
    return x[:, jnp.asarray(plan.cell_unperm)]
