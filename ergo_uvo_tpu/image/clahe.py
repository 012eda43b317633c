"""CLAHE — contrast-limited adaptive histogram equalization, pure JAX.

The reference applies OpenCV's ``createCLAHE`` with a configurable clip limit
(3 mono / 8 stereo) and the default 8x8 tile grid as the last preprocessing
step (VO_utility.cpp:349-355,368-374).  This re-implementation follows
OpenCV's algorithm closely (tile histograms → clip + excess redistribution →
CDF LUTs → bilinear LUT interpolation) with fixed shapes:

  * per-tile 256-bin histograms via a tile reshape + compare-and-reduce
    (scatter-free: TPU scatters serialize, a fused (tiles, area, 256)
    equality-reduction runs on the VPU at full rate),
  * OpenCV's integer excess redistribution (uniform + stepped residual),
  * bilinear interpolation between the 4 neighboring tile LUTs as flat
    gathers.

Parity with cv2 is tolerance-band (±1-2 gray levels from rounding), per
SURVEY.md §4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIST_SIZE = 256


def _pad_reflect101(img: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    """Extend bottom/right by BORDER_REFLECT_101, as OpenCV's CLAHE does."""
    if pad_h:
        img = jnp.concatenate([img, img[..., -2 : -2 - pad_h : -1, :]], axis=-2)
    if pad_w:
        img = jnp.concatenate([img, img[..., :, -2 : -2 - pad_w : -1]], axis=-1)
    return img


def clahe(
    img: jax.Array,
    clip_limit: float = 3.0,
    grid: tuple[int, int] = (8, 8),
) -> jax.Array:
    """Apply CLAHE to a (H, W) float32 gray image in [0, 255].

    Returns float32 in [0, 255].  Input intensities are rounded to integers
    for the histogram/LUT (the reference operates on uint8).
    """
    h, w = img.shape
    gh, gw = grid
    th = -(-h // gh)  # ceil
    tw = -(-w // gw)
    pad_h, pad_w = th * gh - h, tw * gw - w
    padded = _pad_reflect101(img, pad_h, pad_w)

    ints = jnp.clip(jnp.round(padded), 0, 255).astype(jnp.int32)

    # ---- per-tile histograms, scatter-free: reshape into (tiles, area) and
    # count each bin with a fused equality + reduction over the area axis.
    tiles = (
        ints.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(gh * gw, th * tw)
    )
    bins = jnp.arange(HIST_SIZE, dtype=jnp.int32)
    hist = jnp.sum(
        (tiles[:, :, None] == bins[None, None, :]).astype(jnp.int32), axis=1
    )

    # ---- clip + redistribute excess (OpenCV integer semantics).
    tile_area = th * tw
    clip = jnp.maximum(jnp.int32(int(clip_limit * tile_area / HIST_SIZE)), 1)
    excess = jnp.sum(jnp.maximum(hist - clip, 0), axis=-1, keepdims=True)
    clipped = jnp.minimum(hist, clip)
    incr = excess // HIST_SIZE
    residual = excess - incr * HIST_SIZE  # in [0, 255]
    clipped = clipped + incr
    # OpenCV: residualStep = max(histSize // residual, 1); bins 0, step, 2*step,
    # ... (residual of them) each get +1.
    step = jnp.maximum(HIST_SIZE // jnp.maximum(residual, 1), 1)
    bin_idx = jax.lax.broadcasted_iota(jnp.int32, (1, HIST_SIZE), 1)
    gets_one = (bin_idx % step == 0) & (bin_idx // step < residual)
    clipped = clipped + gets_one.astype(clipped.dtype)

    # ---- CDF -> LUT.
    cdf = jnp.cumsum(clipped, axis=-1)
    lut_scale = (HIST_SIZE - 1.0) / tile_area
    luts = jnp.clip(jnp.round(cdf * lut_scale), 0, 255).astype(jnp.float32)

    pix = jnp.clip(jnp.round(padded), 0, 255).astype(jnp.int32)
    if th % 2 == 0 and tw % 2 == 0:
        out = _apply_luts_cells(pix, luts, gh, gw, th, tw)
    else:
        out = _apply_luts_gather(pix, luts, gh, gw, th, tw)
    return jnp.clip(out[:h, :w], 0.0, 255.0)


def _apply_luts_cells(pix, luts, gh, gw, th, tw):
    """Bilinear LUT interpolation, gather-free (the TPU hot path).

    TPU gathers are the slowest op in the pipeline (~10 ms for the 4 LUT
    lookups at 640x480); instead decompose the image into the half-tile-
    shifted "interpolation cells" where the 4 neighboring tile LUTs are
    CONSTANT, and evaluate each lookup as a one-hot x LUT batched matmul on
    the MXU.  Within a cell the bilinear weights are a fixed (th, tw) map
    shared by every cell.  Exact same result as the gather path (OpenCV
    clamped-neighbor semantics), even tile sizes only.
    """
    ph, pw = pix.shape
    C_h, C_w = gh + 1, gw + 1
    # Embed so cell (i, j) = block [i*th, (i+1)*th) x [j*tw, (j+1)*tw) of the
    # half-tile-shifted plane.
    emb = jnp.zeros((C_h * th, C_w * tw), jnp.int32)
    emb = jax.lax.dynamic_update_slice(emb, pix, (th // 2, tw // 2))
    cells = (
        emb.reshape(C_h, th, C_w, tw).transpose(0, 2, 1, 3)
        .reshape(C_h * C_w, th * tw)
    )  # (C, P)

    # Per-cell corner LUTs: rows clamp(i-1), clamp(i); cols clamp(j-1), clamp(j).
    ii = jnp.arange(C_h)
    jj = jnp.arange(C_w)
    r0 = jnp.clip(ii - 1, 0, gh - 1)
    r1 = jnp.clip(ii, 0, gh - 1)
    c0 = jnp.clip(jj - 1, 0, gw - 1)
    c1 = jnp.clip(jj, 0, gw - 1)
    lut_grid = luts.reshape(gh, gw, HIST_SIZE)

    def corner(r, c):
        return lut_grid[r[:, None], c[None, :]].reshape(C_h * C_w, HIST_SIZE)

    luts4 = jnp.stack(
        [corner(r0, c0), corner(r0, c1), corner(r1, c0), corner(r1, c1)], -1
    )  # (C, 256, 4)

    onehot = (
        cells[:, :, None] == jnp.arange(HIST_SIZE, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)
    V = jnp.einsum(
        "cpb,cbk->cpk", onehot, luts4.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (C, P, 4) — LUT values are integers <= 255, exact in bf16 mantissa+MXU f32 acc

    # Fixed per-cell bilinear weight maps: wy = yy/th, wx = xx/tw.
    yy = (jnp.arange(th, dtype=jnp.float32) / th)[:, None]
    xx = (jnp.arange(tw, dtype=jnp.float32) / tw)[None, :]
    w00 = ((1 - yy) * (1 - xx)).reshape(-1)
    w01 = ((1 - yy) * xx).reshape(-1)
    w10 = (yy * (1 - xx)).reshape(-1)
    w11 = (yy * xx).reshape(-1)
    out_cells = (
        V[..., 0] * w00[None]
        + V[..., 1] * w01[None]
        + V[..., 2] * w10[None]
        + V[..., 3] * w11[None]
    )
    out = (
        out_cells.reshape(C_h, C_w, th, tw).transpose(0, 2, 1, 3)
        .reshape(C_h * th, C_w * tw)
    )
    return jax.lax.slice(out, (th // 2, tw // 2), (th // 2 + ph, tw // 2 + pw))


def _apply_luts_gather(pix, luts, gh, gw, th, tw):
    """Flat-gather LUT interpolation (fallback for odd tile sizes)."""
    ph, pw = pix.shape
    luts_flat = luts.reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 1)
    tyf = ys / th - 0.5
    txf = xs / tw - 0.5
    ty0 = jnp.floor(tyf)
    tx0 = jnp.floor(txf)
    wy = tyf - ty0
    wx = txf - tx0
    # Clamp AFTER forming both neighbor indices (OpenCV order): in the outer
    # half-tile border both neighbors collapse onto the edge tile.
    ty0i = ty0.astype(jnp.int32)
    tx0i = tx0.astype(jnp.int32)
    ty1 = jnp.clip(ty0i + 1, 0, gh - 1)
    tx1 = jnp.clip(tx0i + 1, 0, gw - 1)
    ty0 = jnp.clip(ty0i, 0, gh - 1)
    tx0 = jnp.clip(tx0i, 0, gw - 1)

    def lut_at(ty, tx):
        return jnp.take(luts_flat, (ty * gw + tx) * HIST_SIZE + pix)

    v00 = lut_at(ty0, tx0)
    v01 = lut_at(ty0, tx1)
    v10 = lut_at(ty1, tx0)
    v11 = lut_at(ty1, tx1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
