"""Pure-jnp reference rasterizer (exact semantics, autodiff backward).

The ground truth the Pallas TPU kernels must match allclose (forward
images AND gradients — the test strategy SURVEY.md §4 calls for). It is
also the CPU-friendly fallback path.

Structure: Gaussians are depth-sorted once globally; pixels are processed
in fixed-size blocks (lax.map) and Gaussians stream through each block in
chunks (lax.scan) carrying running transmittance — the blockwise
front-to-back recurrence T *= (1 - alpha). Compositing semantics
(clamps, cutoffs, stop test, tile test) are defined in RenderConfig.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import Projected
from robosimgs_tpu.render.tiles import num_tiles, tile_bbox

_PIXEL_BLOCK = 4096


def composite_reference(
    proj: Projected,
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    background: Optional[jax.Array] = None,
    depth_limit: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Composite projected splats into an image.

    Returns dict with rgb (H, W, 3), alpha (H, W), depth (H, W)
    (alpha-weighted accumulated depth, not normalized).
    depth_limit: optional (H, W) per-pixel max depth (mesh z-buffer);
    Gaussians behind it are occluded.
    """
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    tiles_x, tiles_y = num_tiles(width, height, cfg.tile_size)

    n = proj.means2d.shape[0]
    gc = min(cfg.ref_gaussian_chunk, n)
    n_pad = -(-n // gc) * gc

    # Global front-to-back order; invalid slots sort last and are masked.
    sort_key = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(sort_key)

    def g(x):
        x = x[order]
        pad = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    means2d = g(proj.means2d)
    conics = g(proj.conics)
    colors = g(proj.colors)
    opac = g(proj.opacities)
    depths = g(proj.depths)
    valid = g(proj.valid.astype(jnp.float32)) > 0.5
    tx0, ty0, tx1, ty1 = tile_bbox(g(proj.means2d), g(proj.radii), tiles_x, tiles_y, cfg.tile_size)

    n_chunks = n_pad // gc

    def chunked(x):
        return x.reshape((n_chunks, gc) + x.shape[1:])

    chunks = tuple(map(chunked, (means2d, conics, colors, opac, depths,
                                 valid, tx0, ty0, tx1, ty1)))

    # Flattened pixel grid, padded to a block multiple.
    p_total = height * width
    pb = min(_PIXEL_BLOCK, p_total)
    p_pad = -(-p_total // pb) * pb
    pix = jnp.arange(p_pad, dtype=jnp.int32)
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)
    ptx = (pix % width) // cfg.tile_size          # pixel tile coords
    pty = (pix // width) // cfg.tile_size
    if depth_limit is None:
        dlim_flat = jnp.full((p_pad,), jnp.inf, jnp.float32)
    else:
        dlim_flat = jnp.pad(depth_limit.reshape(-1), (0, p_pad - p_total),
                            constant_values=jnp.inf)

    def render_block(block):
        bpx, bpy, bptx, bpty, bdlim = block  # each (pb,)

        def step(carry, ch):
            T, rgb, acc_a, acc_d = carry
            m2d, con, col, op, dep, val, x0, y0, x1, y1 = ch
            dx = bpx[:, None] - m2d[None, :, 0]
            dy = bpy[:, None] - m2d[None, :, 1]
            q = 0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy) \
                + con[None, :, 1] * dx * dy
            alpha = jnp.minimum(cfg.alpha_clamp, op[None, :] * jnp.exp(-q))
            tile_ok = ((bptx[:, None] >= x0[None, :]) & (bptx[:, None] <= x1[None, :])
                       & (bpty[:, None] >= y0[None, :]) & (bpty[:, None] <= y1[None, :]))
            keep = val[None, :] & tile_ok & (alpha >= cfg.alpha_min) & (q >= 0.0)
            keep = keep & (dep[None, :] <= bdlim[:, None])
            alpha = jnp.where(keep, alpha, 0.0)

            log1m = jnp.log1p(-alpha)
            csum = jnp.cumsum(log1m, axis=1)
            excl = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum[:, :-1]], axis=1)
            Tk = T[:, None] * jnp.exp(excl)
            T_after = Tk * (1.0 - alpha)
            w = alpha * Tk * (T_after >= cfg.transmittance_min)

            rgb = rgb + jnp.matmul(w, col, precision="highest")
            acc_a = acc_a + jnp.sum(w, axis=1)
            acc_d = acc_d + jnp.matmul(w, dep[:, None], precision="highest")[:, 0]
            T_new = T * jnp.exp(csum[:, -1])
            return (T_new, rgb, acc_a, acc_d), None

        init = (jnp.ones((pb,)), jnp.zeros((pb, 3)), jnp.zeros((pb,)), jnp.zeros((pb,)))
        (_, rgb, acc_a, acc_d), _ = jax.lax.scan(step, init, chunks)
        return rgb, acc_a, acc_d

    blocks = (px.reshape(-1, pb), py.reshape(-1, pb),
              ptx.reshape(-1, pb), pty.reshape(-1, pb),
              dlim_flat.reshape(-1, pb))
    rgb, acc_a, acc_d = jax.lax.map(render_block, blocks)

    rgb = rgb.reshape(-1, 3)[:p_total].reshape(height, width, 3)
    acc_a = acc_a.reshape(-1)[:p_total].reshape(height, width)
    acc_d = acc_d.reshape(-1)[:p_total].reshape(height, width)
    rgb = rgb + (1.0 - acc_a)[..., None] * background
    return {"rgb": rgb, "alpha": acc_a, "depth": acc_d}
