"""Gathered-tile compositor in pure jnp — oracle for the Pallas kernels.

Operates on the exact same (T, 8, K) gathered feature blocks as the
Pallas kernels (render/pallas_kernels.py) with the same math, so kernel
output can be compared against it elementwise, and its autodiff
gradients check the hand-derived backward. Runs anywhere (CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from robosimgs_tpu.render.config import RenderConfig


def composite_gathered(
    geom: jax.Array,   # (T, 8, K)
    feat: jax.Array,   # (T, 8, K)
    counts: jax.Array, # (T,)
    tiles_x: int,
    cfg: RenderConfig,
    dlim: jax.Array | None = None,  # (T, P) per-pixel depth limits
    t_idx: jax.Array | None = None,  # (T,) within-image tile index
) -> jax.Array:
    """Returns (T, 8, P) per-tile feature images, P = tile_size**2.

    t_idx overrides the per-row tile index used for pixel coordinates —
    multi-camera batches concatenate the tile axis, so row i of image j
    uses t_idx[i] = i % tiles_per_image."""
    ts = cfg.tile_size
    P = ts * ts
    K = geom.shape[2]
    if dlim is None:
        dlim = jnp.full((geom.shape[0], P), jnp.inf, jnp.float32)

    def one_tile(args):
        t_idx, g, f, count, dl = args
        ox = (t_idx % tiles_x) * ts
        oy = (t_idx // tiles_x) * ts
        p = jnp.arange(P, dtype=jnp.int32)
        px = (ox + p % ts).astype(jnp.float32)[:, None]
        py = (oy + p // ts).astype(jnp.float32)[:, None]
        mx, my = g[0][None, :], g[1][None, :]
        ca, cb, cc = g[2][None, :], g[3][None, :], g[4][None, :]
        op = g[5][None, :]
        dx = px - mx
        dy = py - my
        q = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = jnp.minimum(cfg.alpha_clamp, op * jnp.exp(-q))
        kmask = (jnp.arange(K, dtype=jnp.int32) < count)[None, :]
        keep = kmask & (alpha >= cfg.alpha_min) & (q >= 0.0)
        keep = keep & (g[6][None, :] <= dl[:, None])   # mesh depth limit
        alpha = jnp.where(keep, alpha, 0.0)
        l = jnp.log1p(-alpha)
        incl = jnp.cumsum(l, axis=1)
        excl = incl - l
        Tk = jnp.exp(excl)
        Ta = Tk * (1.0 - alpha)
        w = alpha * Tk * (Ta >= cfg.transmittance_min)
        return jnp.einsum("ck,pk->cp", f, w, precision="highest")  # (8, P)

    T = geom.shape[0]
    if t_idx is None:
        t_idx = jnp.arange(T, dtype=jnp.int32)
    return jax.lax.map(one_tile, (t_idx, geom, feat, counts, dlim))


def untile(out_tiles: jax.Array, tiles_x: int, tiles_y: int,
           width: int, height: int, tile_size: int) -> jax.Array:
    """(T, 8, P) per-tile features -> (H, W, 8) image (cropped)."""
    ts = tile_size
    img = out_tiles.reshape(tiles_y, tiles_x, 8, ts, ts)
    img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * ts, tiles_x * ts, 8)
    return img[:height, :width]


def tile_image(img: jax.Array, tiles_x: int, tiles_y: int,
               tile_size: int, pad_value: float = 0.0) -> jax.Array:
    """(H, W) scalar image -> (T, P) per-tile pixel rows (padded)."""
    ts = tile_size
    H, W = img.shape
    padded = jnp.full((tiles_y * ts, tiles_x * ts), pad_value, img.dtype)
    padded = padded.at[:H, :W].set(img)
    t = padded.reshape(tiles_y, ts, tiles_x, ts).transpose(0, 2, 1, 3)
    return t.reshape(tiles_y * tiles_x, ts * ts)
