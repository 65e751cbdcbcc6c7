"""Shared tile geometry helpers (used by the reference path and binning).

Both rasterization paths use the same definition of "Gaussian touches
tile": the inclusive tile-index bbox of the splat's radius square. Pixels
have centers at integer coordinates; pixel j lives in tile j // tile_size.
"""

from __future__ import annotations

import jax.numpy as jnp


def num_tiles(width: int, height: int, tile_size: int):
    return -(-width // tile_size), -(-height // tile_size)


def tile_bbox(means2d, radii, tiles_x: int, tiles_y: int, tile_size: int):
    """Inclusive tile-index bbox (tx0, ty0, tx1, ty1), each (N,) int32.

    Invalid/zero-radius Gaussians produce an empty bbox (tx1 < tx0).
    """
    u, v = means2d[:, 0], means2d[:, 1]
    tx0 = jnp.clip(jnp.floor((u - radii) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((v - radii) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((u + radii) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((v + radii) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    empty = radii <= 0.0
    tx1 = jnp.where(empty, tx0 - 1, tx1)
    return tx0, ty0, tx1, ty1
