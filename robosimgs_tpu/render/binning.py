"""Tile binning under static shapes (XLA sort-based, no atomics).

The TPU replacement for gsplat's CUDA duplicate+radix-sort binning
(SURVEY.md §3.4, hard part #1): every shape is static.

  1. Each Gaussian may cover up to `max_tiles_per_gaussian` tiles of its
     radius bbox (row-major enumeration; larger coverage is truncated
     and counted in stats — never silent).
  2. (tile_id, depth_rank, gaussian_id) triples are sorted
     lexicographically with a single `lax.sort(num_keys=2)` — the TPU
     analog of the CUDA radix sort over (tileID << 32 | depth) keys.
  3. Per-tile ranges come from searchsorted over the sorted tile ids;
     each tile keeps its closest `tile_capacity` Gaussians (fixed-size
     (T, K) index matrix + counts). Overflow beyond capacity drops the
     farthest entries and is counted in stats.

Depth order inside a tile equals the global depth order restricted to
the tile (rank comes from one global argsort), which is exactly the
per-tile order the reference semantics require — and the same order the
pure-jnp reference path uses, so the two paths agree bitwise in
structure.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import Projected
from robosimgs_tpu.render.tiles import num_tiles, tile_bbox


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinStats:
    """Truncation accounting (all int32 scalars)."""

    truncated_gaussians: jax.Array  # gaussians covering > max_tiles tiles
    overflowed_tiles: jax.Array     # tiles with more than capacity entries
    max_tile_count: jax.Array       # max entries wanted by any tile
    total_pairs: jax.Array          # total (gaussian, tile) intersections


def _divmod_small(e: jax.Array, d: jax.Array):
    """(e // d, e % d) for small non-negative ints via f32 reciprocal.

    Integer division lowers to a long VPU op sequence on TPU; for the
    (N, M) tile-id expansion it dominated the binning profile. With
    e < ~2^20 and d >= 1 the +0.5 midpoint keeps the true fractional
    part >= 0.5/d away from integer boundaries, far beyond f32 rounding
    error, so floor((e + 0.5) * (1/d)) is exact."""
    inv = 1.0 / d.astype(jnp.float32)
    q = jnp.floor((e.astype(jnp.float32) + 0.5) * inv).astype(jnp.int32)
    return q, e - q * d


def bin_rects(
    tx0: jax.Array, ty0: jax.Array, tx1: jax.Array, ty1: jax.Array,
    rank: jax.Array, valid: jax.Array,
    tiles_x: int, tiles_y: int, max_tiles_per_prim: int, tile_capacity: int,
) -> Tuple[jax.Array, jax.Array, BinStats]:
    """Generic static-shape tile binner for rect-bounded primitives
    (Gaussian splats, triangles). Returns (sel, counts, stats):
    sel (T, K) int32 primitive indices ordered by `rank` within each
    tile; counts (T,) int32.
    """
    T = tiles_x * tiles_y
    n = tx0.shape[0]
    M = max_tiles_per_prim
    K = tile_capacity

    bw = (tx1 - tx0 + 1).clip(0)
    bh = (ty1 - ty0 + 1).clip(0)
    cover = bw * bh

    e = jnp.arange(M, dtype=jnp.int32)[None, :]            # (1, M)
    bw_safe = jnp.maximum(bw, 1)[:, None]
    row, col = _divmod_small(e, bw_safe)
    valid_e = (e < cover[:, None]) & valid[:, None]
    tid = (ty0[:, None] + row) * tiles_x + (tx0[:, None] + col)
    tid = jnp.where(valid_e, tid, T).astype(jnp.int32)     # T = sentinel, sorts last

    flat_tid = tid.reshape(-1)
    flat_rank = jnp.broadcast_to(rank[:, None], (n, M)).reshape(-1)
    flat_gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, M)).reshape(-1)
    s_tid, _, s_gid = jax.lax.sort((flat_tid, flat_rank, flat_gid), num_keys=2)

    bounds = jnp.searchsorted(s_tid, jnp.arange(T + 1, dtype=jnp.int32))
    starts = bounds[:-1]
    full_counts = (bounds[1:] - starts).astype(jnp.int32)
    counts = jnp.minimum(full_counts, K)

    idx = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    mask = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    sel = s_gid[jnp.clip(idx, 0, n * M - 1)]
    sel = jnp.where(mask, sel, 0).astype(jnp.int32)

    stats = BinStats(
        truncated_gaussians=jnp.sum((cover > M) & valid).astype(jnp.int32),
        overflowed_tiles=jnp.sum(full_counts > K).astype(jnp.int32),
        max_tile_count=jnp.max(full_counts).astype(jnp.int32),
        total_pairs=jnp.sum(jnp.where(valid, jnp.minimum(cover, M), 0)).astype(jnp.int32),
    )
    return sel, counts, stats


def _cull_keep(m2d, cop, tx0, ty0, col, row, tile_size: int,
               alpha_min: float) -> jax.Array:
    """Exact ellipse-tile intersection keep-mask for (N, M) candidate
    tiles: keep iff min over the tile's pixel-center rect of the
    quadratic form q = .5*ca*u^2 + cb*u*v + .5*cc*v^2 is <=
    log(op / alpha_min) — a dropped tile has alpha < alpha_min at EVERY
    pixel, so the compositor keep-mask zeroes it (values AND grads)
    anyway; culling is lossless. The rect min of the PSD quadratic is 0
    if the mean is inside, else the min over the four clamped edge
    restrictions.

    m2d (N, 2) screen means; cop (N, 4) [conic_a, conic_b, conic_c,
    opacity]; tx0/ty0 (N,) bbox tile origins; col/row (N, M) or (1, M)
    candidate offsets within the bbox.
    """
    ts_f = float(tile_size)
    ca, cb, cc, op = (cop[:, 0:1], cop[:, 1:2], cop[:, 2:3], cop[:, 3:4])
    u0 = (tx0[:, None] + col).astype(jnp.float32) * ts_f - m2d[:, 0:1]
    v0 = (ty0[:, None] + row).astype(jnp.float32) * ts_f - m2d[:, 1:2]
    u1 = u0 + (ts_f - 1.0)
    v1 = v0 + (ts_f - 1.0)
    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)

    def edge_u(uf):  # u fixed, v free in [v0, v1]
        vs = jnp.clip(-cb * uf / cc_s, v0, v1)
        return (0.5 * ca) * uf * uf + cb * uf * vs + (0.5 * cc) * vs * vs

    def edge_v(vf):  # v fixed, u free in [u0, u1]
        us = jnp.clip(-cb * vf / ca_s, u0, u1)
        return (0.5 * ca) * us * us + cb * us * vf + (0.5 * cc) * vf * vf

    qmin = jnp.minimum(jnp.minimum(edge_u(u0), edge_u(u1)),
                       jnp.minimum(edge_v(v0), edge_v(v1)))
    inside = (u0 <= 0.0) & (0.0 <= u1) & (v0 <= 0.0) & (0.0 <= v1)
    qmin = jnp.where(inside, 0.0, qmin)
    qcut = jnp.log(jnp.maximum(op, 1e-12) / alpha_min)
    # cull only with a definitely-PSD conic (conservative otherwise)
    psd = (ca > 0.0) & (cc > 0.0)
    return ~psd | (qmin <= qcut)


def per_gaussian_cover(proj: Projected, width: int, height: int,
                       cfg: RenderConfig, max_tiles: int) -> jax.Array:
    """(N,) int32 — tiles each gaussian actually hits after the exact
    cull (bbox cover when exact_tile_cull is off), enumerating up to
    max_tiles bbox tiles. Autotune uses this to right-size
    max_tiles_per_gaussian (the cull typically removes bbox corner
    tiles, so the needed M is smaller than the bbox cover)."""
    tiles_x, tiles_y = num_tiles(width, height, cfg.tile_size)
    radii = jnp.where(proj.valid, proj.radii.astype(jnp.float32), 0.0)
    tx0, ty0, tx1, ty1 = tile_bbox(proj.means2d, radii, tiles_x, tiles_y,
                                   cfg.tile_size)
    bw = (tx1 - tx0 + 1).clip(0)
    cover = bw * (ty1 - ty0 + 1).clip(0)
    e = jnp.arange(max_tiles, dtype=jnp.int32)[None, :]
    row, col = _divmod_small(e, jnp.maximum(bw, 1)[:, None])
    valid_e = (e < cover[:, None]) & (radii > 0.0)[:, None]
    if cfg.exact_tile_cull:
        cop = jnp.stack([proj.conics[:, 0], proj.conics[:, 1],
                         proj.conics[:, 2],
                         jnp.where(proj.valid, proj.opacities, 0.0)], axis=1)
        valid_e = valid_e & _cull_keep(
            jax.lax.stop_gradient(proj.means2d), jax.lax.stop_gradient(cop),
            tx0, ty0, col, row, cfg.tile_size, cfg.alpha_min)
    return jnp.sum(valid_e, axis=1).astype(jnp.int32)


def bin_gaussians(
    proj: Projected, width: int, height: int, cfg: RenderConfig
) -> Tuple[jax.Array, jax.Array, BinStats]:
    """Returns (sel, counts, stats).

    sel:    (T, K) int32 — per-tile Gaussian indices, front-to-back.
    counts: (T,)   int32 — live entries per tile (<= K).
    """
    tiles_x, tiles_y = num_tiles(width, height, cfg.tile_size)
    n = proj.means2d.shape[0]

    tx0, ty0, tx1, ty1 = tile_bbox(proj.means2d, proj.radii, tiles_x, tiles_y, cfg.tile_size)

    # Global front-to-back rank (same stable argsort as the reference path).
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    return bin_rects(tx0, ty0, tx1, ty1, rank, proj.valid, tiles_x, tiles_y,
                     cfg.max_tiles_per_gaussian, cfg.tile_capacity)


def gather_tile_features(proj: Projected, sel: jax.Array, counts: jax.Array, cfg: RenderConfig):
    """Gather per-tile feature blocks for the composite kernels.

    Returns:
      geom: (T, 8, K) — rows [mx, my, conic_a, conic_b, conic_c, opacity, depth, 0]
            (depth in row 6 feeds the per-pixel depth-limit test used
            for mesh-occlusion-aware compositing; non-differentiable)
      feat: (T, 8, K) — rows [r, g, b, depth, 1, 0, 0, 0]

    Padding entries (beyond counts) get opacity 0, which makes them
    inert in both forward and backward (alpha < alpha_min mask).
    Differentiable: gradients flow back through the takes as
    scatter-adds to the per-Gaussian arrays (the atomics-free
    accumulation of SURVEY.md hard part #2).
    """
    K = sel.shape[1]
    mask = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    mx = proj.means2d[sel, 0]
    my = proj.means2d[sel, 1]
    ca = proj.conics[sel, 0]
    cb = proj.conics[sel, 1]
    cc = proj.conics[sel, 2]
    op = jnp.where(mask, proj.opacities[sel], 0.0)
    zeros = jnp.zeros_like(mx)
    gd = jax.lax.stop_gradient(proj.depths[sel])
    geom = jnp.stack([mx, my, ca, cb, cc, op, gd, zeros], axis=1)

    r = proj.colors[sel, 0]
    g = proj.colors[sel, 1]
    b = proj.colors[sel, 2]
    d = proj.depths[sel]
    ones = jnp.ones_like(r)
    # normal rows mirror pack16 (rows 5/6 = nx/ny, row 7 = nz when the
    # absgrad probe doesn't own it)
    n5 = proj.normals[sel, 0] if proj.normals is not None else zeros
    n6 = proj.normals[sel, 1] if proj.normals is not None else zeros
    f7 = zeros
    if proj.normals is not None and proj.abs_probe is None:
        f7 = proj.normals[sel, 2]
    feat = jnp.stack([r, g, b, d, ones, n5, n6, f7], axis=1)
    return geom, feat


def pack16(proj: Projected) -> jax.Array:
    """The (N, 16) per-gaussian feature matrix consumed by the tile
    compositors: columns 0..7 are the geom rows [mx, my, conic_a/b/c,
    opacity, sg(depth), 0], columns 8..15 the feat rows [r, g, b, depth,
    1, 0, 0, 0]. Shared by the fast binning path and the ring-streamed
    compositor so their gathered payloads (and gradients) agree exactly.
    """
    zeros = jnp.zeros_like(proj.depths)
    ones = jnp.ones_like(proj.depths)
    mask_f = proj.valid.astype(jnp.float32)
    sg = jax.lax.stop_gradient
    # columns 7 / 15 are the absgrad probe (zeros as VALUES; their
    # COTANGENTS carry the per-pixel |dL/dmean2d| sums written by the
    # Pallas backward, riding the same binning transpose as everything
    # else). Without a probe they're literal zeros.
    px = proj.abs_probe[:, 0] if proj.abs_probe is not None else zeros
    py_ = proj.abs_probe[:, 1] if proj.abs_probe is not None else zeros
    # normal-map rendering: camera-space nx/ny ride the free feat rows
    # 5/6 (columns 13/14); nz takes row 7 unless the absgrad probe
    # owns it (then composite_from_tiles reconstructs nz from nx/ny —
    # exact whenever a pixel's contributors share one normal)
    n13 = proj.normals[:, 0] if proj.normals is not None else zeros
    n14 = proj.normals[:, 1] if proj.normals is not None else zeros
    c15 = py_
    if proj.normals is not None and proj.abs_probe is None:
        c15 = proj.normals[:, 2]
    return jnp.stack([
        proj.means2d[:, 0], proj.means2d[:, 1],
        proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
        proj.opacities * mask_f,
        sg(proj.depths), px,
        proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
        proj.depths, ones, n13, n14, c15,
    ], axis=1)


def bin_and_gather_packed(proj: Projected, width: int, height: int,
                          cfg: RenderConfig, return_sel: bool = False):
    """Optimized bin+gather for the training hot path.

    Profile-driven redesign of bin_gaussians + gather_tile_features
    (which dominated the train step): Gaussians are permuted into global
    depth order first, so pair entries are generated already rank-ordered
    and one *stable single-key* sort by tile id replaces the two-key
    lexicographic sort; all sixteen per-tile feature rows come from a
    single (T, K) row gather of a (N, 16) packed feature matrix (one
    gather + one transpose instead of sixteen gathers).

    Returns (geom (T,8,K), feat (T,8,K), counts (T,), stats); with
    return_sel also the (T, K) int32 ORIGINAL-index selection matrix
    (ring-streamed compositing uses it for global-id tie-breaking).
    Gradients flow to proj.* through the packed stack + two row gathers
    (their transposes are row scatter-adds — the atomics-free
    accumulation).
    """
    tiles_x, tiles_y = num_tiles(width, height, cfg.tile_size)
    T = tiles_x * tiles_y
    n = proj.means2d.shape[0]
    M = cfg.max_tiles_per_gaussian
    K = cfg.tile_capacity

    # Pack per-gaussian features (geom rows 0..7, feat rows 0..7) in one
    # differentiable (N, 16) matrix and the stop-gradient bbox inputs in
    # a separate (N, 3) matrix — TPU gather cost scales with ROW COUNT,
    # not row width (~10 ns/row measured), so two full-row permutes beat
    # per-field narrow ones; and gathers must move WHOLE rows (a column
    # slice fused into a gather/scatter de-vectorizes XLA's lowering to
    # per-element ops, ~160x slower, measured).
    sg = jax.lax.stop_gradient
    packed = pack16(proj)
    bbox_in = jnp.stack([
        sg(proj.means2d[:, 0]), sg(proj.means2d[:, 1]),
        jnp.where(proj.valid, proj.radii.astype(jnp.float32), 0.0),
        sg(proj.conics[:, 0]), sg(proj.conics[:, 1]), sg(proj.conics[:, 2]),
        jnp.where(proj.valid, sg(proj.opacities), 0.0),
    ], axis=1)  # (N, 7); cols 3..6 feed the exact-intersection cull

    # Global front-to-back permutation. Only the narrow bbox inputs are
    # permuted up front; the wide 16-column payload is gathered ONCE at
    # the end through the COMPOSED index order[sel] — fusing the
    # depth-permute into the tile gather removes an (N, 16) row gather
    # from the forward and, more importantly, its N-row scatter-add
    # transpose from the backward (scatters run ~3x the issue cost of
    # gathers; measured in docs/ROOFLINE.md).
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf)
                        ).astype(jnp.int32)
    bbox_s = bbox_in[order]
    m2d_s = bbox_s[:, 0:2]
    radii_s = bbox_s[:, 2]
    valid_s = radii_s > 0.0

    tx0, ty0, tx1, ty1 = tile_bbox(m2d_s, radii_s, tiles_x, tiles_y,
                                   cfg.tile_size)
    bw = (tx1 - tx0 + 1).clip(0)
    cover = bw * (ty1 - ty0 + 1).clip(0)

    # enumerate Mb bbox tiles; after the cull, survivors are compacted
    # down to M slots (one small row-local sort: sentinels = T sort to
    # the tail, order within a row is irrelevant — the global key sort
    # below owns ordering), so the N*M key sort runs over SURVIVOR
    # capacity while the bbox enumeration can be wider.
    Mb = max(cfg.bbox_tiles_per_gaussian, M)
    e = jnp.arange(Mb, dtype=jnp.int32)[None, :]
    bw_safe = jnp.maximum(bw, 1)[:, None]
    valid_e = (e < cover[:, None]) & valid_s[:, None]
    row, col = _divmod_small(e, bw_safe)
    tid = (ty0[:, None] + row) * tiles_x + (tx0[:, None] + col)

    if cfg.exact_tile_cull:
        valid_e = valid_e & _cull_keep(
            m2d_s, bbox_s[:, 3:7], tx0, ty0, col, row,
            cfg.tile_size, cfg.alpha_min)

    tid = jnp.where(valid_e, tid, T).astype(jnp.int32)   # sentinel sorts last
    surv = jnp.sum(valid_e, axis=1).astype(jnp.int32)    # per-gaussian cover
    # the packed single-int32-key sort (and the two-tier split that
    # rides on it) applies only when (tid, gid) fits in 31 bits; decide
    # up front so the two-tier row-local sort below isn't wasted work
    # when the fallback two-array sort will run anyway
    gid_bits = max(1, (n - 1).bit_length())
    packed_fits = (T + 1) << gid_bits <= 2**31
    Ms = cfg.two_tier_split
    two_tier = (0 < Ms < M) and packed_fits
    if (0 < Ms < M) and not packed_fits:
        import warnings
        warnings.warn(
            f"two_tier_split={Ms} ignored: packed key needs "
            f"{(T + 1).bit_length() + gid_bits} bits (> 31) at T={T}, "
            f"n={n}; falling back to the two-array sort")
    if Mb > M:
        tid = jnp.sort(tid, axis=1)[:, :M]
    elif two_tier:
        # two-tier needs sentinels at the row tail even when the bbox
        # enumeration wasn't widened (the exact cull leaves holes)
        tid = jnp.sort(tid, axis=1)

    # entries are already depth-ordered (rows ascend in rank), so a
    # stable sort by tile id alone preserves front-to-back order per
    # tile. When (tid, gid) fits in 31 bits, pack both into ONE int32
    # key — sorting by (tid << bits | gid) equals the stable sort (gid
    # ascends with rank) and halves sort bandwidth (no payload array).
    spill_missed = jnp.zeros((n,), bool)  # rows needing spill that lost
    spill_dropped_pairs = jnp.int32(0)
    if packed_fits:
        if two_tier:
            # tier 1: everyone's first Ms (row-sorted) slots. tier 2:
            # the S widest gaussians contribute slots Ms..M. Rows are
            # tid-sorted, so a gaussian with cover <= Ms has only
            # sentinels past column Ms — top_k rows that don't actually
            # spill contribute inert sentinel keys, no masking needed.
            S = min(n, max(128, -(-int(cfg.two_tier_spill_frac * n) // 128)
                           * 128))
            gid1 = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[:, None], (n, Ms))
            key1 = (tid[:, :Ms] << gid_bits) | gid1
            spill_cover, spill_idx = jax.lax.top_k(surv, S)
            # pre-sliced spill source + barrier: a column slice fused
            # INTO a row gather de-vectorizes XLA's lowering (measured
            # ~160x, see docs/ROOFLINE.md); slicing first keeps the
            # gather whole-row
            spill_src = jax.lax.optimization_barrier(tid[:, Ms:])
            key2 = (spill_src[spill_idx] << gid_bits) | spill_idx[:, None]
            packed_key = jnp.concatenate(
                [key1.reshape(-1), key2.reshape(-1)])
            survM = jnp.minimum(surv, M)
            need = jnp.sum(jnp.maximum(survM - Ms, 0))
            got = jnp.sum(jnp.maximum(jnp.minimum(spill_cover, M) - Ms, 0))
            spill_dropped_pairs = (need - got).astype(jnp.int32)
            # exact per-row membership (not a count difference): a row
            # that both exceeds M and misses the spill must be counted
            # once, not twice, in truncated_gaussians
            spill_missed = (surv > Ms) & ~jnp.zeros(
                (n,), bool).at[spill_idx].set(True)
        else:
            gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                                   (n, M))
            packed_key = (tid.reshape(-1) << gid_bits) | gid.reshape(-1)
        L = packed_key.shape[0]
        s_key = jax.lax.sort(packed_key)
        # Per-tile bounds from searchsorted on shifted tile-id queries
        # (key low bits are gid >= 0, so bisect_left at gid=0 lands on
        # the tile boundary).
        bounds = jnp.searchsorted(
            s_key, jnp.arange(T + 1, dtype=jnp.int32) << gid_bits)
        # Each tile's K candidates are CONTIGUOUS in the sorted keys:
        # read them as T dynamic slices (vmap of dynamic_slice lowers
        # to one gather with slice_sizes=K — 256 slice reads instead of
        # T*K scalar gathers, ~15x cheaper on TPU).
        s_key_pad = jnp.concatenate(
            [s_key, jnp.full((K,), jnp.int32(2**31 - 1))])
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(s_key_pad, (s,), (K,))
        )(jnp.minimum(bounds[:-1], L))                   # (T, K)
        sel_rank = win & ((1 << gid_bits) - 1)
    else:
        gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                               (n, M))
        s_tid, s_gid = jax.lax.sort((tid.reshape(-1), gid.reshape(-1)),
                                    num_keys=1, is_stable=True)
        bounds = jnp.searchsorted(s_tid, jnp.arange(T + 1, dtype=jnp.int32))
        s_gid_pad = jnp.concatenate([s_gid, jnp.zeros((K,), jnp.int32)])
        sel_rank = jax.vmap(
            lambda s: jax.lax.dynamic_slice(s_gid_pad, (s,), (K,))
        )(jnp.minimum(bounds[:-1], n * M))

    starts = bounds[:-1]
    full_counts = (bounds[1:] - starts).astype(jnp.int32)
    counts = jnp.minimum(full_counts, K)

    kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    sel = jax.lax.stop_gradient(
        order[jnp.where(kmask, sel_rank, 0)])            # (T, K) ORIGINAL ids

    gathered = packed[sel]                               # (T, K, 16)
    # padding entries must be inert: zero their opacity column
    gathered = gathered.at[:, :, 5].set(
        jnp.where(kmask, gathered[:, :, 5], 0.0))
    gathered = jnp.swapaxes(gathered, 1, 2)              # (T, 16, K)
    geom = gathered[:, :8]
    feat = gathered[:, 8:]

    stats = BinStats(
        truncated_gaussians=jnp.sum(
            valid_s & ((cover > Mb) | (surv > M) | spill_missed)
        ).astype(jnp.int32),
        overflowed_tiles=jnp.sum(full_counts > K).astype(jnp.int32),
        max_tile_count=jnp.max(full_counts).astype(jnp.int32),
        total_pairs=jnp.sum(jnp.minimum(surv, M)).astype(jnp.int32)
        - spill_dropped_pairs,
    )
    if return_sel:
        return geom, feat, counts, stats, sel
    return geom, feat, counts, stats
