"""Pallas TPU kernels: per-tile front-to-back compositing, fwd + bwd.

The hot O(pixels x gaussians) stage of the rasterizer — the TPU-native
replacement for gsplat's CUDA tile kernels (SURVEY.md §2.2). One grid
step = one (16x16 tile, capacity chunk) pair; the chunk's gathered
Gaussians (VMEM capacity Kc) are consumed in 128-wide lane blocks:

  * alpha evaluation is pure VPU work on (P, BK) blocks;
  * the front-to-back transmittance recurrence T *= (1 - alpha) is an
    exclusive prefix product along lanes computed as ONE MXU matmul in
    log space (log1p(-alpha) @ upper-tri, then exp) — the carried
    transmittance stays linear, so f32 underflow to 0 is exactly the
    saturated-tile semantics;
  * color accumulation and the backward reductions are MXU matmuls:
    the backward's six per-Gaussian geometry-gradient rows come from a
    single dq-weighted pixel-moment matmul (dx = px - mx is separable)
    instead of per-pixel products + lane reductions.

Chunking (grid = (T, C), chunks innermost, carried VMEM scratch) makes
`tile_capacity` an HBM-bounded TOTAL while only `tile_chunk` entries
are VMEM-resident per pass — overflow compositing is exact, capacity is
a perf knob, not a quality knob (VERDICT r1 item 3). The same carried
(acc, T) state implements the blockwise-streaming scan of SURVEY.md §5.

The backward pass is a SINGLE back-to-front sweep (gsplat-style): the
forward emits the final per-pixel transmittance and the number of lane
blocks it processed before saturating; the backward reconstructs T_k by
un-multiplying block totals in log space (stable down to T=0) while the
suffix gradient term accumulates naturally in reverse. Per-Gaussian
grads leave as per-tile (8, K) blocks the caller segment-sums — no
atomics (SURVEY.md hard part #2).

Gradient semantics match the reference CUDA rasterizer: zero through
the alpha clamp at 0.99, the 1/255 cutoff, and the 1e-4 stop test.

`n_tiles_per_image` supports multi-camera batches by concatenating the
tile axis: tile t of image j shares pixel coordinates with tile
t % n_tiles_per_image of image 0 (scenegen rollout batching).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robosimgs_tpu.render.config import RenderConfig

# gaussians per lane block; larger blocks amortize loop/early-exit
# overhead at coarser exit granularity (RSGS_BK env var for tuning)
BK = int(os.environ.get("RSGS_BK", "128"))


def _tile_pixel_coords(t, tiles_x: int, ts: int):
    P = ts * ts
    ox = (t % tiles_x) * ts
    oy = (t // tiles_x) * ts
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (ox + p % ts).astype(jnp.float32)
    py = (oy + p // ts).astype(jnp.float32)
    return px, py


def _pixel_moments(t, tiles_x: int, ts: int):
    """(P, 8) tile-local pixel-moment matrix [1, x, y, x^2, y^2, xy,
    0, 0] + the tile origin — shared by the backward's moment-matmul
    gradients and the MXU alpha evaluation (cfg.alpha_mxu)."""
    P = ts * ts
    ox = ((t % tiles_x) * ts).astype(jnp.float32)
    oy = ((t // tiles_x) * ts).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pxl = (p % ts).astype(jnp.float32)
    pyl = (p // ts).astype(jnp.float32)
    ones = jnp.ones_like(pxl)
    Cm = jnp.concatenate([ones, pxl, pyl, pxl * pxl, pyl * pyl, pxl * pyl,
                          jnp.zeros_like(pxl), jnp.zeros_like(pxl)],
                         axis=1)          # (P, 8)
    return Cm, ox, oy


def _alpha_block_mxu(g, Cm, ox, oy, cfg: RenderConfig, dlim=None):
    """MXU variant of _alpha_block: q is quadratic in the pixel coords,
    so the whole (P, BK) block is ONE matmul of the tile's pixel
    moments against per-gaussian quadratic coefficients (O(BK) VPU prep
    instead of O(P*BK) VPU ops). Values match the per-pixel path to f32
    rounding; q is clamped at 0 (matmul noise at a splat's exact center
    must not flip the q>=0 guard) while strongly negative q — non-PSD
    junk the guard exists for — still drops."""
    mxl = g[0:1, :] - ox
    myl = g[1:2, :] - oy
    ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
    op = g[5:6, :]
    A = 0.5 * (ca * mxl * mxl + cc * myl * myl) + cb * mxl * myl
    B = -(ca * mxl + cb * myl)
    C = -(cc * myl + cb * mxl)
    coef = jnp.concatenate([A, B, C, 0.5 * ca, 0.5 * cc, cb,
                            jnp.zeros_like(A), jnp.zeros_like(A)], axis=0)
    q = jax.lax.dot_general(
        Cm, coef, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (P, BK)
    qp = jnp.maximum(q, 0.0)
    eq = jnp.exp(-qp)
    raw = op * eq
    alpha = jnp.minimum(cfg.alpha_clamp, raw)
    keep = (alpha >= cfg.alpha_min) & (q >= -0.5)
    if dlim is not None:
        keep = keep & (g[6:7, :] <= dlim)
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, keep, raw, eq, qp


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


def _fwd_kernel(counts_ref, geom_ref, feat_ref, dlim_ref,
                out_ref, tfin_ref, nblk_ref, acc_scr, t_scr, lt_scr, nb_scr,
                *, cfg: RenderConfig, tiles_x: int, n_tiles_img: int,
                n_chunks: int, kc: int, has_dlim: bool = True):
    ts = cfg.tile_size
    t = pl.program_id(0)
    c = pl.program_id(1)
    count = counts_ref[t]
    px, py = _tile_pixel_coords(t % n_tiles_img, tiles_x, ts)
    dlim = dlim_ref[0] if has_dlim else None  # (P, 1) | compiled out

    # Exclusive prefix PRODUCT along lanes as one MXU matmul in log
    # space (x @ U = inclusive cumsum; exclusive = incl - x) instead of
    # a 7-step Hillis-Steele roll chain — the per-block VPU op count is
    # the kernel bottleneck (docs/ROOFLINE.md). The carried tc stays
    # LINEAR so f32 underflow to 0 keeps the saturated-tile semantics.
    row = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 1)
    U = (row <= col).astype(jnp.float32)
    if cfg.alpha_mxu:
        Cm, ox, oy = _pixel_moments(t % n_tiles_img, tiles_x, ts)

    @pl.when(c == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        t_scr[:] = jnp.ones_like(t_scr)
        lt_scr[:] = jnp.zeros_like(lt_scr)
        nb_scr[0] = 0

    count_loc = jnp.clip(count - c * kc, 0, kc)

    def body(carry):
        i, acc, tc, ltc = carry
        off = pl.multiple_of(i * BK, BK)
        g = geom_ref[0, :, pl.ds(off, BK)]
        if cfg.alpha_mxu:
            alpha, *_ = _alpha_block_mxu(g, Cm, ox, oy, cfg, dlim)
        else:
            alpha, *_ = _alpha_block(g, px, py, cfg, dlim)
        om = 1.0 - alpha
        l = jnp.log1p(-alpha)
        incl = jax.lax.dot_general(
            l, U, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        Tk = tc * jnp.exp(incl - l)                   # (P, BK)
        w = alpha * Tk * (Tk * om >= cfg.transmittance_min)
        f = feat_ref[0, :, pl.ds(off, BK)]
        acc = acc + jax.lax.dot_general(
            f, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        tc = tc * jnp.exp(incl[:, BK - 1:BK])
        # ALSO accumulate log-T: the linear tc underflows f32 to 0 on
        # saturated pixels (by design — exactly the saturation
        # semantics), but the backward must reconstruct per-block
        # transmittance by SUBTRACTING block sums from the final value,
        # which is impossible from an underflowed 0 (it zeroed ALL
        # gradients on such pixels, including the visible front splats).
        ltc = ltc + incl[:, BK - 1:BK]
        return i + 1, acc, tc, ltc

    def cond(carry):
        i, _, tc, _ = carry
        return (i * BK < count_loc) & (jnp.max(tc) >= cfg.transmittance_min)

    n_i, acc, tc, ltc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), acc_scr[:], t_scr[:], lt_scr[:]))
    acc_scr[:] = acc
    t_scr[:] = tc
    lt_scr[:] = ltc
    nb_scr[0] = nb_scr[0] + n_i

    @pl.when(c == n_chunks - 1)
    def _():
        out_ref[0] = acc_scr[:]
        tfin_ref[0] = lt_scr[:]      # LOG of final transmittance
        # 1-D (T,) full-array SMEM block (dense, 4 B/tile): the old
        # 2-D (T,1) SMEM layout lane-padded every row to 512 B, so at
        # T>=2048 tiles (800x800 = 2500) it exceeded the 1 MB SMEM
        # budget and the whole kernel failed to compile
        nblk_ref[t] = nb_scr[0]


def _bwd_kernel(counts_ref, nblk_ref, geom_ref, feat_ref, dlim_ref, gout_ref,
                tfin_ref, dgeom_ref, dfeat_ref, suf_scr, lt_scr,
                *, cfg: RenderConfig, tiles_x: int, n_tiles_img: int,
                n_chunks: int, kc: int, has_dlim: bool = True):
    ts = cfg.tile_size
    t = pl.program_id(0)
    cidx = pl.program_id(1)          # iteration order (0 = LAST chunk)
    c = n_chunks - 1 - cidx          # actual chunk index, descending
    nblk = nblk_ref[t]
    px, py = _tile_pixel_coords(t % n_tiles_img, tiles_x, ts)
    dlim = dlim_ref[0] if has_dlim else None  # (P, 1) | compiled out
    gout = gout_ref[0]  # (8, P)

    # Loop-invariant MXU operands (hoisted; the per-block VPU work is
    # the bottleneck — see docs/ROOFLINE.md step-cost decomposition):
    #  * U: upper-triangular ones — x @ U is an inclusive lane cumsum in
    #    ONE f32 matmul instead of a 7-step Hillis-Steele roll chain;
    #  * Cm: dq-weighted pixel-moment matrix. dx = px - mx is separable,
    #    so every geometry gradient row is a linear combination of
    #    sum_p dq * [1, px, py, px^2, py^2, px*py] — one (8,P)x(P,BK)
    #    matmul replaces six (P,BK) per-pixel products + reductions.
    #    TILE-LOCAL coords (px - ox in [0, ts)) keep the moments small
    #    for f32 accuracy.
    row = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BK, BK), 1)
    U = (row <= col).astype(jnp.float32)
    # (P, 8) tile-local moments; rows 6-7 pad to lane width
    Cm, ox, oy = _pixel_moments(t % n_tiles_img, tiles_x, ts)

    def cumsum_mxu(x):
        return jax.lax.dot_general(
            x, U, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(cidx == 0)
    def _():
        suf_scr[:] = jnp.zeros_like(suf_scr)
        # the forward's final transmittance, already in LOG space (the
        # forward accumulates it exactly even where the linear T
        # underflows f32 to 0 — reconstructing from log(max(T, tiny))
        # zeroed every gradient on saturated pixels, front splats
        # included)
        lt_scr[:] = tfin_ref[0]

    dgeom_ref[0] = jnp.zeros_like(dgeom_ref[0])
    dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

    blocks_per_chunk = kc // BK
    n_loc = jnp.clip(nblk - c * blocks_per_chunk, 0, blocks_per_chunk)

    def body(j, carry):
        suf, lte = carry
        i = n_loc - 1 - j
        off = pl.multiple_of(i * BK, BK)
        g = geom_ref[0, :, pl.ds(off, BK)]
        if cfg.alpha_mxu and not cfg.absgrad:
            # absgrad needs per-pixel dx/dy; everything else gets q
            # from the same moment matmul the gradients already use
            alpha, keep, raw, eq, q = _alpha_block_mxu(g, Cm, ox, oy,
                                                       cfg, dlim)
            dx = dy = None
        else:
            alpha, keep, raw, eq, q, dx, dy = _alpha_block(g, px, py, cfg,
                                                           dlim)
        ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
        om = 1.0 - alpha
        l = jnp.log1p(-alpha)
        incl = cumsum_mxu(l)
        lin = lte - incl[:, BK - 1:BK]               # logT entering block
        Tk = jnp.exp(lin + (incl - l))               # (P, BK)
        m = (Tk * om >= cfg.transmittance_min)
        w = alpha * Tk * m
        f = feat_ref[0, :, pl.ds(off, BK)]
        gamma = jax.lax.dot_general(
            gout, f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # (P, BK)
        gw = gamma * w
        incl_gw = cumsum_mxu(gw)
        suffix = suf + (incl_gw[:, BK - 1:BK] - incl_gw)   # sum over j > k
        dalpha = jnp.where(m, gamma * Tk, 0.0) - suffix / om
        dalpha = jnp.where(keep, dalpha, 0.0)
        unclamped = raw < cfg.alpha_clamp
        dq = jnp.where(unclamped, -alpha * dalpha, 0.0)

        # geometry grads from dq-weighted pixel moments (one matmul):
        mom = jax.lax.dot_general(
            Cm, dq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # (8, BK)
        s0, sx, sy = mom[0:1], mom[1:2], mom[2:3]
        sxx, syy, sxy = mom[3:4], mom[4:5], mom[5:6]
        mxl, myl = g[0:1, :] - ox, g[1:2, :] - oy    # tile-local means
        cx = sx - mxl * s0                           # sum dq * dx
        cy = sy - myl * s0                           # sum dq * dy
        dmx = -(ca * cx + cb * cy)
        dmy = -(cc * cy + cb * cx)
        dca = 0.5 * (sxx - 2.0 * mxl * sx + mxl * mxl * s0)
        dcb = sxy - mxl * sy - myl * sx + mxl * myl * s0
        dcc = 0.5 * (syy - 2.0 * myl * sy + myl * myl * s0)
        # dq = -opacity * dop elementwise (alpha = op*eq when unclamped,
        # both zeroed together by keep/clamp) => sum dop = -s0 / op
        op = g[5:6, :]
        dop_s = -s0 / jnp.maximum(op, 1e-30)
        zeros = jnp.zeros_like(dmx)
        # absgrad (gsplat absgrad semantics): per-pixel |screen grad|
        # summed BEFORE sign cancellation, emitted as the cotangent of
        # the abs_probe columns (geom row 7 = x, feat row 7 = y).
        # abs breaks moment separability — per-pixel path, absgrad only.
        if cfg.absgrad:
            absx = jnp.sum(jnp.abs(-dq * (ca * dx + cb * dy)),
                           axis=0, keepdims=True)
        else:
            absx = zeros
        dgeom_ref[0, :, pl.ds(off, BK)] = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dop_s, zeros, absx], axis=0)
        dfeat = jax.lax.dot_general(
            gout, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # (8, BK)
        if cfg.absgrad:
            absy = jnp.sum(jnp.abs(-dq * (cc * dy + cb * dx)),
                           axis=0, keepdims=True)
            dfeat = jnp.concatenate([dfeat[:7], absy], axis=0)
        dfeat_ref[0, :, pl.ds(off, BK)] = dfeat
        return suf + incl_gw[:, BK - 1:BK], lin

    suf, lte = jax.lax.fori_loop(0, n_loc, body, (suf_scr[:], lt_scr[:]))
    suf_scr[:] = suf
    lt_scr[:] = lte


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _chunking(cfg: RenderConfig, CK: int):
    kc = cfg.tile_chunk or CK
    if kc % BK != 0:
        raise ValueError(f"tile_chunk {kc} must be a multiple of {BK}")
    if CK % kc != 0:
        raise ValueError(f"tile_capacity {CK} must be a multiple of "
                         f"tile_chunk {kc}")
    return kc, CK // kc


@functools.partial(jax.jit, static_argnames=("tiles_x", "cfg", "interpret",
                                             "n_tiles_per_image",
                                             "has_dlim"))
def composite_fwd_pallas(geom, feat, counts, dlim, *, tiles_x: int,
                         cfg: RenderConfig, interpret: bool | None = None,
                         n_tiles_per_image: int = 0, has_dlim: bool = True):
    """(T,8,K) geom/feat + (T,) counts + (T,P,1) depth limits ->
    (out (T,8,P), log_t_final (T,P,1), n_blocks (T,) int32).

    log_t_final is the LOG of each pixel's final transmittance over the
    processed blocks — exact even where linear T underflows f32 to 0 on
    saturated pixels; the backward reconstructs per-block transmittance
    from it by subtraction."""
    T, _, CK = geom.shape
    kc, C = _chunking(cfg, CK)
    P = cfg.tile_size * cfg.tile_size
    n_img = n_tiles_per_image or T
    if interpret is None:
        interpret = _interpret()
    kernel = functools.partial(_fwd_kernel, cfg=cfg, tiles_x=tiles_x,
                               n_tiles_img=n_img, n_chunks=C, kc=kc,
                               has_dlim=has_dlim)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, 8, kc), lambda t, c, cnt: (t, 0, c)),
            pl.BlockSpec((1, 8, kc), lambda t, c, cnt: (t, 0, c)),
            pl.BlockSpec((1, P, 1), lambda t, c, cnt: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, P), lambda t, c, cnt: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, c, cnt: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, P), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),   # carried log-T
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
            jax.ShapeDtypeStruct((T, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((T,), jnp.int32),
        ],
        interpret=interpret,
    )(counts, geom, feat, dlim)


@functools.partial(jax.jit, static_argnames=("tiles_x", "cfg", "interpret",
                                             "n_tiles_per_image",
                                             "has_dlim"))
def composite_bwd_pallas(geom, feat, counts, dlim, gout, tfin, nblk, *,
                         tiles_x: int, cfg: RenderConfig,
                         interpret: bool | None = None,
                         n_tiles_per_image: int = 0, has_dlim: bool = True):
    """Backward (single back-to-front sweep): returns (dgeom, dfeat),
    each (T, 8, K). tfin/nblk are the forward's carried outputs."""
    T, _, CK = geom.shape
    kc, C = _chunking(cfg, CK)
    P = cfg.tile_size * cfg.tile_size
    n_img = n_tiles_per_image or T
    if interpret is None:
        interpret = _interpret()
    kernel = functools.partial(_bwd_kernel, cfg=cfg, tiles_x=tiles_x,
                               n_tiles_img=n_img, n_chunks=C, kc=kc,
                               has_dlim=has_dlim)
    rev = C - 1  # chunk iteration is reversed: cidx 0 touches chunk C-1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, 8, kc), lambda t, c, *_: (t, 0, rev - c)),
            pl.BlockSpec((1, 8, kc), lambda t, c, *_: (t, 0, rev - c)),
            pl.BlockSpec((1, P, 1), lambda t, c, *_: (t, 0, 0)),
            pl.BlockSpec((1, 8, P), lambda t, c, *_: (t, 0, 0)),
            pl.BlockSpec((1, P, 1), lambda t, c, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, kc), lambda t, c, *_: (t, 0, rev - c)),
            pl.BlockSpec((1, 8, kc), lambda t, c, *_: (t, 0, rev - c)),
        ],
        scratch_shapes=[
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 8, CK), jnp.float32),
            jax.ShapeDtypeStruct((T, 8, CK), jnp.float32),
        ],
        interpret=interpret,
    )(counts, nblk, geom, feat, dlim, gout, tfin)
