"""Per-frame bilateral-grid color correction (splatfacto's
`use_bilateral_grid`, from "Bilateral Guided Radiance Field Processing"
— the spatially-varying generalization of the per-frame affine exposure
in trainer.py, for captures with vignetting / local white-balance
drift; `/root/reference/README.md:73-75` delegates stage-1 training to
splatfacto, whose quality envelope includes this).

Each frame owns a (gh, gw, gl, 12) grid of 3x4 color affines; a pixel
at (y, x) with rendered luminance g is corrected by the affine
trilinearly interpolated at grid coordinate (y/H, x/W, g).

TPU-native evaluation — NO per-pixel gathers (the ~10 ns/row gather
issue rate would dwarf the arithmetic, docs/ROOFLINE.md):

  * the spatial (y, x) interpolation weights are FIXED per pixel, so
    interpolating all luminance levels at once is ONE static matmul
    (P, gh*gw) @ (gh*gw, gl*12) on the MXU;
  * the luminance axis is then a tiny hat-function weighted sum on the
    VPU ((P, gl) weights from the rendered gray value).

The dense weight matrix is O(P * gh*gw) — ~0.5 GB at 1080p with the
default (8, 8, 4) grid — so the pixel axis is CHUNKED (lax.map over row
blocks, ~2^16 pixels each): peak memory stays a few MB per step at any
resolution while each block is still one MXU matmul. Small frames take
the single-block fast path.

A total-variation penalty keeps the grid smooth where the capture
gives no signal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GRAY = (0.299, 0.587, 0.114)
_IDENTITY = (1.0, 0.0, 0.0, 0.0,
             0.0, 1.0, 0.0, 0.0,
             0.0, 0.0, 1.0, 0.0)

# pixels per chunk of the blocked evaluation: 2^16 keeps the weight
# matrix ~16 MB at (8,8,4) while each block still fills the MXU
_CHUNK_PIXELS = 1 << 16


def identity_bilagrid(n_frames: int, shape: tuple = (8, 8, 4)) -> jax.Array:
    """(n_frames, gh, gw, gl, 12) grids of identity color affines."""
    gh, gw, gl = shape
    e = jnp.asarray(_IDENTITY, jnp.float32)
    return jnp.broadcast_to(e, (n_frames, gh, gw, gl, 12))


def _spatial_weights(py: jax.Array, h: int, w: int, gh: int,
                     gw: int) -> jax.Array:
    """(len(py)*W, gh*gw) bilinear interpolation weights, pixel-major,
    for the image rows listed in `py` (traced int row indices of the
    FULL h-row frame — callers pass a contiguous block).

    Align-corners convention: pixel centers map to [0, g-1] linearly.
    Rows sum to 1; at most 4 nonzeros per row — evaluated densely so
    the spatial interp is one MXU matmul instead of per-pixel gathers.
    """
    px = jnp.arange(w, dtype=jnp.float32)[None, :]          # (1, W)
    fy = py.astype(jnp.float32)[:, None] * ((gh - 1) / max(h - 1, 1))
    fx = px * ((gw - 1) / max(w - 1, 1))
    ly = jnp.arange(gh, dtype=jnp.float32)                  # (gh,)
    lx = jnp.arange(gw, dtype=jnp.float32)                  # (gw,)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy[..., None] - ly))   # (R, 1, gh)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx[..., None] - lx))   # (1, W, gw)
    w2 = wy[:, :, :, None] * wx[:, :, None, :]              # (R, W, gh, gw)
    return w2.reshape(-1, gh * gw)


def _apply_block(grid: jax.Array, rgb_rows: jax.Array, y0: jax.Array,
                 h: int) -> jax.Array:
    """Correct one contiguous block of image rows. rgb_rows: (R, W, 3);
    y0: traced index of its first row in the full h-row frame."""
    gh, gw, gl, _ = grid.shape
    r, w, _ = rgb_rows.shape
    flat = rgb_rows.reshape(-1, 3)                          # (P, 3)
    py = y0 + jnp.arange(r)
    sw = _spatial_weights(py, h, w, gh, gw)                 # (P, gh*gw)
    s = sw @ grid.reshape(gh * gw, gl * 12)                 # (P, gl*12)
    s = s.reshape(-1, gl, 12)
    # luminance axis: hat-function weights from the rendered gray value
    gray = jnp.clip(flat @ jnp.asarray(_GRAY, jnp.float32), 0.0, 1.0)
    pos = gray * (gl - 1)                                   # (P,)
    lv = jnp.arange(gl, dtype=jnp.float32)
    wl = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - lv))  # (P, gl)
    a = jnp.einsum("pl,plc->pc", wl, s).reshape(-1, 3, 4)   # (P, 3, 4)
    out = jnp.einsum("pij,pj->pi", a[:, :, :3], flat) + a[:, :, 3]
    return jnp.clip(out, 0.0, None).reshape(r, w, 3)


def apply_bilagrid(grid: jax.Array, rgb: jax.Array) -> jax.Array:
    """Correct a rendered image with one frame's bilateral grid.

    grid: (gh, gw, gl, 12) — 3x4 affines, row-major ([r_row, g_row,
    b_row] each [wr, wg, wb, bias]). rgb: (H, W, 3). Returns (H, W, 3),
    clipped at 0 like the exposure path (trainer.py loss_fn).

    Evaluation is blocked over row chunks of ~2^16 pixels (see module
    docstring); gradients flow to the grid through the lax.map.
    """
    h, w, _ = rgb.shape
    rows_c = max(1, _CHUNK_PIXELS // w)
    if h <= rows_c:                                         # small-frame path
        return _apply_block(grid, rgb, jnp.int32(0), h)
    n = -(-h // rows_c)
    pad = n * rows_c - h
    rgbp = jnp.pad(rgb, ((0, pad), (0, 0), (0, 0)))
    blocks = rgbp.reshape(n, rows_c, w, 3)
    y0s = jnp.arange(n, dtype=jnp.int32) * rows_c
    out = jax.lax.map(lambda a: _apply_block(grid, a[0], a[1], h),
                      (blocks, y0s))
    return out.reshape(n * rows_c, w, 3)[:h]


def tv_loss(grid: jax.Array) -> jax.Array:
    """Mean squared finite difference along the three grid axes
    (all frames): keeps unobserved grid regions near their neighbors.
    grid: (..., gh, gw, gl, 12)."""
    dy = grid[..., 1:, :, :, :] - grid[..., :-1, :, :, :]
    dx = grid[..., :, 1:, :, :] - grid[..., :, :-1, :, :]
    dl = grid[..., :, :, 1:, :] - grid[..., :, :, :-1, :]
    return (jnp.mean(dy * dy) + jnp.mean(dx * dx) + jnp.mean(dl * dl))
