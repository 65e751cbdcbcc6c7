"""Pallas TPU kernels: per-tile front-to-back compositing, fwd + bwd.

The hot O(pixels x gaussians) stage of the rasterizer — the TPU-native
replacement for gsplat's CUDA tile kernels (SURVEY.md §2.2). One grid
step = one 16x16 tile; the tile's gathered Gaussians (capacity K) live
in VMEM and are consumed in 128-wide lane blocks:

  * alpha evaluation is pure VPU work on (P, BK) blocks;
  * the front-to-back transmittance recurrence T *= (1 - alpha) is a
    log-space prefix sum along lanes (Hillis–Steele with pltpu.roll);
  * color accumulation and the backward reductions are MXU matmuls
    ((8, BK) x (BK, P) feature blocks against the weight matrix).

The backward pass recomputes alphas per block (no residuals beyond the
inputs) and turns gsplat's atomic per-pixel scatter into per-tile
(8, K) gradient blocks that the caller segment-sums per Gaussian —
atomics-free by construction (SURVEY.md hard part #2). A per-tile
early-exit (while_loop on max remaining transmittance) skips fully
saturated tails.

Gradient semantics match the reference CUDA rasterizer: zero through
the alpha clamp at 0.99, the 1/255 cutoff, and the 1e-4 stop test.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robosimgs_tpu.render.config import RenderConfig

BK = 128  # gaussians per lane block


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along the last (lane) axis, Hillis–Steele."""
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=x.ndim - 1)
        x = x + jnp.where(col >= s, shifted, 0.0)
        s *= 2
    return x


def _tile_pixel_coords(t, tiles_x: int, ts: int):
    P = ts * ts
    ox = (t % tiles_x) * ts
    oy = (t // tiles_x) * ts
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (ox + p % ts).astype(jnp.float32)
    py = (oy + p // ts).astype(jnp.float32)
    return px, py


def _alpha_block(g, px, py, cfg: RenderConfig, dlim=None):
    """Shared fwd/bwd alpha math for one (8, BK) geometry block.

    dlim: optional (P, 1) per-pixel depth limit — a Gaussian behind it
    (geom row 6 depth > dlim) is occluded (mesh compositing)."""
    mx, my = g[0:1, :], g[1:2, :]
    ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
    op = g[5:6, :]
    dx = px - mx   # (P, BK)
    dy = py - my
    q = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    eq = jnp.exp(-q)
    raw = op * eq
    alpha = jnp.minimum(cfg.alpha_clamp, raw)
    keep = (alpha >= cfg.alpha_min) & (q >= 0.0)
    if dlim is not None:
        keep = keep & (g[6:7, :] <= dlim)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, keep, raw, eq, q, dx, dy


def _fwd_kernel(counts_ref, geom_ref, feat_ref, dlim_ref, out_ref, *, cfg: RenderConfig,
                tiles_x: int, n_blocks: int):
    ts = cfg.tile_size
    P = ts * ts
    t = pl.program_id(0)
    count = counts_ref[t]
    px, py = _tile_pixel_coords(t, tiles_x, ts)
    dlim = dlim_ref[0]  # (P, 1)
    log_tmin = math.log(cfg.transmittance_min)

    def body(carry):
        i, acc, logT = carry
        off = pl.multiple_of(i * BK, BK)
        g = geom_ref[0, :, pl.ds(off, BK)]
        alpha, *_ = _alpha_block(g, px, py, cfg, dlim)
        l = jnp.log1p(-alpha)
        incl = _cumsum_lanes(l)
        Tk = jnp.exp(logT + (incl - l))
        Ta = Tk * (1.0 - alpha)
        w = alpha * Tk * (Ta >= cfg.transmittance_min)
        f = feat_ref[0, :, pl.ds(off, BK)]
        acc = acc + jax.lax.dot_general(
            f, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        logT = logT + incl[:, BK - 1:BK]
        return i + 1, acc, logT

    def cond(carry):
        i, _, logT = carry
        alive = jnp.max(logT) >= log_tmin
        return (i * BK < count) & alive

    init = (jnp.int32(0), jnp.zeros((8, P), jnp.float32), jnp.zeros((P, 1), jnp.float32))
    _, acc, _ = jax.lax.while_loop(cond, body, init)
    out_ref[0] = acc


def _bwd_kernel(counts_ref, geom_ref, feat_ref, dlim_ref, gout_ref, dgeom_ref, dfeat_ref,
                *, cfg: RenderConfig, tiles_x: int, n_blocks: int):
    ts = cfg.tile_size
    P = ts * ts
    t = pl.program_id(0)
    count = counts_ref[t]
    px, py = _tile_pixel_coords(t, tiles_x, ts)
    dlim = dlim_ref[0]  # (P, 1)
    gout = gout_ref[0]  # (8, P)

    dgeom_ref[0] = jnp.zeros_like(dgeom_ref[0])
    dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    # Pass A: total per-pixel gamma*w mass R_p (for the suffix term).
    def body_a(carry):
        i, R, logT = carry
        off = pl.multiple_of(i * BK, BK)
        g = geom_ref[0, :, pl.ds(off, BK)]
        alpha, *_ = _alpha_block(g, px, py, cfg, dlim)
        l = jnp.log1p(-alpha)
        incl = _cumsum_lanes(l)
        Tk = jnp.exp(logT + (incl - l))
        w = alpha * Tk * (Tk * (1.0 - alpha) >= cfg.transmittance_min)
        f = feat_ref[0, :, pl.ds(off, BK)]
        gamma = jax.lax.dot_general(
            gout, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (P, BK)
        R = R + jnp.sum(gamma * w, axis=1, keepdims=True)
        logT = logT + incl[:, BK - 1:BK]
        return i + 1, R, logT

    def cond_a(carry):
        i, _, logT = carry
        return (i * BK < count) & (jnp.max(logT) >= math.log(cfg.transmittance_min))

    init_a = (jnp.int32(0), jnp.zeros((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32))
    _, R_total, _ = jax.lax.while_loop(cond_a, body_a, init_a)

    # Pass B: recompute + gradients per block.
    def body_b(carry):
        i, prefix_gw, logT = carry
        off = pl.multiple_of(i * BK, BK)
        g = geom_ref[0, :, pl.ds(off, BK)]
        alpha, keep, raw, eq, q, dx, dy = _alpha_block(g, px, py, cfg, dlim)
        ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
        l = jnp.log1p(-alpha)
        incl = _cumsum_lanes(l)
        Tk = jnp.exp(logT + (incl - l))
        m = (Tk * (1.0 - alpha) >= cfg.transmittance_min)
        w = alpha * Tk * m
        f = feat_ref[0, :, pl.ds(off, BK)]
        gamma = jax.lax.dot_general(
            gout, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (P, BK)
        gw = gamma * w
        incl_gw = prefix_gw + _cumsum_lanes(gw)
        suffix = R_total - incl_gw                      # sum over j > k
        dalpha = jnp.where(m, gamma * Tk, 0.0) - suffix / (1.0 - alpha)
        dalpha = jnp.where(keep, dalpha, 0.0)
        unclamped = raw < cfg.alpha_clamp
        dq = jnp.where(unclamped, -alpha * dalpha, 0.0)
        dop = jnp.where(unclamped, eq * dalpha, 0.0)

        dmx = -jnp.sum(dq * (ca * dx + cb * dy), axis=0, keepdims=True)
        dmy = -jnp.sum(dq * (cc * dy + cb * dx), axis=0, keepdims=True)
        dca = jnp.sum(dq * 0.5 * dx * dx, axis=0, keepdims=True)
        dcb = jnp.sum(dq * dx * dy, axis=0, keepdims=True)
        dcc = jnp.sum(dq * 0.5 * dy * dy, axis=0, keepdims=True)
        dop_s = jnp.sum(dop, axis=0, keepdims=True)
        zeros = jnp.zeros_like(dmx)
        dgeom_ref[0, :, pl.ds(off, BK)] = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dop_s, zeros, zeros], axis=0)
        dfeat_ref[0, :, pl.ds(off, BK)] = jax.lax.dot_general(
            gout, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (8, BK)

        prefix_gw = incl_gw[:, BK - 1:BK]
        logT = logT + incl[:, BK - 1:BK]
        return i + 1, prefix_gw, logT

    def cond_b(carry):
        i, _, logT = carry
        return (i * BK < count) & (jnp.max(logT) >= math.log(cfg.transmittance_min))

    init_b = (jnp.int32(0), jnp.zeros((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32))
    jax.lax.while_loop(cond_b, body_b, init_b)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("tiles_x", "cfg", "interpret"))
def composite_fwd_pallas(geom, feat, counts, dlim, *, tiles_x: int, cfg: RenderConfig,
                         interpret: bool | None = None):
    """(T,8,K) geom/feat + (T,) counts + (T,P) depth limits -> (T,8,P)."""
    T, _, K = geom.shape
    if K % BK != 0:
        raise ValueError(f"tile_capacity {K} must be a multiple of {BK}")
    P = cfg.tile_size * cfg.tile_size
    if interpret is None:
        interpret = _interpret()
    kernel = functools.partial(_fwd_kernel, cfg=cfg, tiles_x=tiles_x, n_blocks=K // BK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 8, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, c: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, P), lambda t, c: (t, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=interpret,
    )(counts, geom, feat, dlim)


@functools.partial(jax.jit, static_argnames=("tiles_x", "cfg", "interpret"))
def composite_bwd_pallas(geom, feat, counts, dlim, gout, *, tiles_x: int, cfg: RenderConfig,
                         interpret: bool | None = None):
    """Backward: returns (dgeom, dfeat), each (T, 8, K)."""
    T, _, K = geom.shape
    P = cfg.tile_size * cfg.tile_size
    if interpret is None:
        interpret = _interpret()
    kernel = functools.partial(_bwd_kernel, cfg=cfg, tiles_x=tiles_x, n_blocks=K // BK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 8, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 8, P), lambda t, c: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, K), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, 8, K), lambda t, c: (t, 0, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, K), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, K), jnp.float32),
        ],
        interpret=interpret,
    )(counts, geom, feat, dlim, gout)
