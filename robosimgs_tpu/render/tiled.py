"""Tile-binned rasterization path (XLA binning + Pallas compositing).

Pipeline (SURVEY.md §3.4): project (jnp, autodiff) -> bin (XLA sort,
static shapes) -> gather per-tile features (differentiable takes) ->
per-tile composite (Pallas kernels wrapped in a custom_vjp) -> untile.

Per-Gaussian gradient accumulation happens in the gather's transpose
(XLA scatter-add over the (T, K) index matrix) — the atomics-free
equivalent of gsplat's atomicAdd accumulation.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from robosimgs_tpu.render.binning import (bin_and_gather_packed,
                                          bin_gaussians,
                                          gather_tile_features)
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.gathered import (composite_gathered, tile_image,
                                           untile)
from robosimgs_tpu.render.pallas_kernels import (composite_bwd_pallas,
                                                composite_fwd_pallas)
from robosimgs_tpu.render.project import Projected
from robosimgs_tpu.render.tiles import num_tiles


@functools.lru_cache(maxsize=None)
def _make_compositor(tiles_x: int, cfg: RenderConfig, interpret: bool,
                     n_tiles_per_image: int = 0, has_dlim: bool = True):
    # has_dlim=False compiles the depth-limit occlusion test out of both
    # kernels entirely (training composites no mesh; the dlim operand is
    # still passed so the call signature stays uniform)
    @jax.custom_vjp
    def comp(geom, feat, counts, dlim):
        out, _, _ = composite_fwd_pallas(
            geom, feat, counts, dlim, tiles_x=tiles_x, cfg=cfg,
            interpret=interpret, n_tiles_per_image=n_tiles_per_image,
            has_dlim=has_dlim)
        return out

    def fwd(geom, feat, counts, dlim):
        out, tfin, nblk = composite_fwd_pallas(
            geom, feat, counts, dlim, tiles_x=tiles_x, cfg=cfg,
            interpret=interpret, n_tiles_per_image=n_tiles_per_image,
            has_dlim=has_dlim)
        return out, (geom, feat, counts, dlim, tfin, nblk)

    def bwd(res, gout):
        geom, feat, counts, dlim, tfin, nblk = res
        dgeom, dfeat = composite_bwd_pallas(
            geom, feat, counts, dlim, gout, tfin, nblk.reshape(-1),
            tiles_x=tiles_x, cfg=cfg, interpret=interpret,
            n_tiles_per_image=n_tiles_per_image, has_dlim=has_dlim)
        return dgeom, dfeat, None, None

    comp.defvjp(fwd, bwd)
    return comp


def composite_tiled(
    proj: Projected,
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    background: Optional[jax.Array] = None,
    compositor: str = "pallas",
    return_stats: bool = False,
    depth_limit: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Composite projected splats via the tile-binned path.

    compositor: "pallas" (TPU kernels; interpreter on CPU) or "jnp"
    (gathered-tile jnp oracle with autodiff backward).
    depth_limit: optional (H, W) per-pixel max depth (e.g. a rasterized
    mesh's z-buffer) — Gaussians behind it are occluded.
    """
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    tiles_x, tiles_y = num_tiles(width, height, cfg.tile_size)

    geom, feat, counts, stats = bin_and_gather_packed(proj, width, height, cfg)
    counts = jax.lax.stop_gradient(counts)

    if depth_limit is None:
        dlim = None   # compiles the occlusion test out of the kernels
    else:
        dlim = tile_image(jax.lax.stop_gradient(depth_limit), tiles_x, tiles_y,
                          cfg.tile_size, pad_value=jnp.inf)
    out = composite_from_tiles(geom, feat, counts, width, height, cfg,
                               background, compositor, dlim,
                               normal_mode=_normal_mode(proj))
    if return_stats:
        out["stats"] = stats
    return out


def _normal_mode(proj: Projected) -> str:
    """Which feat rows carry splat normals (see binning.pack16):
    "xyz" = rows 5/6/7, "xy" = rows 5/6 with nz reconstructed (the
    absgrad probe owns row 7), "none" = no normal rendering."""
    if proj.normals is None:
        return "none"
    return "xy" if proj.abs_probe is not None else "xyz"


def _normal_map(img: jax.Array, acc_a: jax.Array, mode: str) -> jax.Array:
    """(…, 8)-channel composited image -> (…, 3) unit camera-space
    normal map. In "xy" mode nz is reconstructed from the accumulated
    alpha (|Σw·n| = Σw exactly when a pixel's contributors share one
    normal — the regularizer's optimum; elsewhere an under-estimate
    that still orders alignment correctly)."""
    sx, sy = img[..., 5], img[..., 6]
    if mode == "xyz":
        sz = img[..., 7]
    else:
        # eps inside the sqrt: d(sqrt)/dx at a clamped 0 must be 0, not
        # inf (uncovered pixels are gated out of losses, but a NaN/inf
        # grad times the 0 gate is still NaN — the where-grad trap)
        sz = -jnp.sqrt(jnp.maximum(acc_a * acc_a - sx * sx - sy * sy,
                                   1e-24))
    n = jnp.stack([sx, sy, sz], -1)
    # rsqrt of a clamped square: zero vectors (empty pixels) normalize
    # to 0 with ZERO gradient instead of the NaN jnp.linalg.norm emits
    sq = jnp.sum(n * n, -1, keepdims=True)
    return n * jax.lax.rsqrt(jnp.maximum(sq, 1e-16))


def composite_from_tiles(
    geom: jax.Array,            # (T, 8, K)
    feat: jax.Array,            # (T, 8, K)
    counts: jax.Array,          # (T,)
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    background: Optional[jax.Array] = None,
    compositor: str = "pallas",
    dlim: Optional[jax.Array] = None,    # (T, P) per-pixel depth limits
    normal_mode: str = "none",
) -> Dict[str, jax.Array]:
    """Composite pre-gathered per-tile feature blocks into an image.

    The entry point for callers that build geom/feat themselves (the
    ring-streamed gaussian-sharded path assembles them by merging
    per-shard chunks); composite_tiled is bin_and_gather_packed + this.
    normal_mode ("none"/"xyz"/"xy", see _normal_mode): adds a "normal"
    unit-vector map to the output when feat rows carry splat normals.
    """
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    tiles_x, tiles_y = num_tiles(width, height, cfg.tile_size)
    P = cfg.tile_size * cfg.tile_size
    has_dlim = dlim is not None
    if dlim is None:
        dlim = jnp.full((geom.shape[0], P), jnp.inf, jnp.float32)

    if compositor == "pallas":
        interpret = jax.default_backend() != "tpu"
        comp = _make_compositor(tiles_x, cfg, interpret, has_dlim=has_dlim)
        out_tiles = comp(geom, feat, counts, dlim[..., None])
    elif compositor == "jnp":
        out_tiles = composite_gathered(geom, feat, counts, tiles_x, cfg, dlim)
    else:
        raise ValueError(f"unknown compositor {compositor!r}")

    img = untile(out_tiles, tiles_x, tiles_y, width, height, cfg.tile_size)
    acc_a = img[..., 4]
    rgb = img[..., :3] + (1.0 - acc_a)[..., None] * background
    out = {"rgb": rgb, "alpha": acc_a, "depth": img[..., 3]}
    if normal_mode != "none":
        out["normal"] = _normal_map(img, acc_a, normal_mode)
    return out


def composite_tiled_batch(
    projs: Projected,
    width: int,
    height: int,
    cfg: RenderConfig = RenderConfig(),
    background: Optional[jax.Array] = None,
    compositor: str = "pallas",
    return_stats: bool = False,
    depth_limit: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Multi-camera composite: `projs` has a leading camera axis (C, ...).

    The compile-sane batched path (VERDICT r1 item 7): per-camera
    binning is a vmap of the XLA sort pipeline (compiles once), and the
    camera axis is CONCATENATED onto the tile axis so ONE Pallas grid of
    C*T tiles composites every camera — no per-camera graph unrolling,
    no vmap over pallas_call. Returns rgb/alpha/depth with a leading
    camera axis; depth_limit is (C, H, W) if given.
    """
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    tiles_x, tiles_y = num_tiles(width, height, cfg.tile_size)

    geom, feat, counts, stats = jax.vmap(
        lambda p: bin_and_gather_packed(p, width, height, cfg))(projs)
    n_cam, T = counts.shape
    K = geom.shape[-1]
    P = cfg.tile_size * cfg.tile_size
    geom_f = geom.reshape(n_cam * T, 8, K)
    feat_f = feat.reshape(n_cam * T, 8, K)
    counts_f = jax.lax.stop_gradient(counts.reshape(n_cam * T))

    if depth_limit is None:
        dlim = jnp.full((n_cam * T, P), jnp.inf, jnp.float32)
    else:
        dlim = jax.vmap(lambda d: tile_image(
            jax.lax.stop_gradient(d), tiles_x, tiles_y, cfg.tile_size,
            pad_value=jnp.inf))(depth_limit).reshape(n_cam * T, P)

    if compositor == "pallas":
        interpret = jax.default_backend() != "tpu"
        comp = _make_compositor(tiles_x, cfg, interpret, n_tiles_per_image=T,
                                has_dlim=depth_limit is not None)
        out_tiles = comp(geom_f, feat_f, counts_f, dlim[..., None])
    elif compositor == "jnp":
        t_idx = jnp.arange(n_cam * T, dtype=jnp.int32) % T
        out_tiles = composite_gathered(geom_f, feat_f, counts_f, tiles_x,
                                       cfg, dlim, t_idx=t_idx)
    else:
        raise ValueError(f"unknown compositor {compositor!r}")

    imgs = jax.vmap(lambda o: untile(o, tiles_x, tiles_y, width, height,
                                     cfg.tile_size))(
        out_tiles.reshape(n_cam, T, 8, P))
    acc_a = imgs[..., 4]
    rgb = imgs[..., :3] + (1.0 - acc_a)[..., None] * background
    out = {"rgb": rgb, "alpha": acc_a, "depth": imgs[..., 3]}
    if _normal_mode(projs) != "none":
        out["normal"] = _normal_map(imgs, acc_a, _normal_mode(projs))
    if return_stats:
        out["stats"] = stats
    return out
