"""Capacity auto-tuning: pick lossless static capacities for a scene.

Static shapes demand capacity knobs (`max_tiles_per_gaussian`,
`tile_capacity`); wrong values truncate silently-degrading quality
(caught by BinStats, see ARCHITECTURE.md §6). This measures a scene
against representative cameras with generous caps and returns the
smallest power-of-two-ish capacities with headroom — the recommended
workflow before long training runs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.binning import bin_and_gather_packed
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import project
from robosimgs_tpu.render.tiles import num_tiles, tile_bbox


def _round_up(x: int, step: int) -> int:
    return max(step, ((x + step - 1) // step) * step)


def recommend_capacities(
    gaussians: Gaussians,
    cameras: Sequence[Camera],
    base: RenderConfig = RenderConfig(),
    headroom: float = 1.5,
    gate_db: Optional[float] = None,
) -> RenderConfig:
    """Measure per-camera tile statistics and return a RenderConfig whose
    capacities are lossless for the measured views (x headroom).

    tile_capacity is rounded to a multiple of 128 (the Pallas lane-block
    size); max_tiles_per_gaussian to a multiple of 4.

    gate_db: when set, additionally searches for the SMALLEST
    tile_capacity whose render of the measured cameras matches the
    full-demand capacity above this PSNR (r5 finding: dense scenes
    saturate transmittance long before the max per-tile demand —
    K-overflow drops only the farthest entries, so a gated K of 512 can
    be output-equivalent to a 22k lossless capacity while the (T, K)
    gather work shrinks ~40x; the bench gates at 60 dB). M/bbox stay
    at their lossless values — M-truncation drops NEAR tiles and is
    never gated away. Costs one render per candidate K per camera.
    """
    from robosimgs_tpu.render.binning import per_gaussian_cover

    max_cover = 0      # surviving tiles (post-cull) — sizes the M sort
    max_bbox = 0       # bbox tiles — sizes the enumeration cap
    max_count = 0
    covers = []        # per-camera survivor-cover arrays (two-tier pick)
    for cam in cameras:
        proj = project(gaussians, cam, base)
        tiles_x, tiles_y = num_tiles(cam.width, cam.height, base.tile_size)
        tx0, ty0, tx1, ty1 = tile_bbox(proj.means2d, proj.radii,
                                       tiles_x, tiles_y, base.tile_size)
        bbox_cover = jnp.where(
            proj.valid,
            (tx1 - tx0 + 1).clip(0) * (ty1 - ty0 + 1).clip(0), 0)
        max_bbox = max(max_bbox, int(jnp.max(bbox_cover)))
        # tiles the gaussian ACTUALLY hits (exact cull removes bbox
        # corner tiles), enumerated over the full bbox
        cover = per_gaussian_cover(proj, cam.width, cam.height, base,
                                   max_tiles=max(max_bbox, 1))
        covers.append(cover)
        max_cover = max(max_cover, int(jnp.max(cover)))
        # probe with generous caps to read true per-tile demand
        probe = dataclasses.replace(
            base,
            max_tiles_per_gaussian=_round_up(max(max_bbox, 1), 4),
            bbox_tiles_per_gaussian=0,
            tile_capacity=_round_up(
                min(int(gaussians.num_alive), 1 << 17), 128))
        _, _, _, stats = bin_and_gather_packed(proj, cam.width, cam.height,
                                               probe)
        max_count = max(max_count, int(stats.max_tile_count))

    kept = _round_up(int(math.ceil(max_cover * headroom)), 4)
    bbox = _round_up(int(math.ceil(max_bbox * headroom)), 4)

    # two-tier sort pick: choose the split s minimizing total key-sort
    # slots s*N + spill_rows(s)*(kept-s), where spill_rows is the worst
    # camera's count of gaussians covering > s tiles (x headroom,
    # rounded to the 128-row spill granularity). Enabled only when it
    # removes >=25% of slots — the split costs a top_k + a spill-row
    # gather, which a marginal slot saving doesn't repay.
    n = int(gaussians.means.shape[0])
    split, frac = 0, 0.0
    if kept > 2 and n > 0:
        # one histogram per camera gives count(cover > s) for ALL s in a
        # single device transfer (the per-(s, camera) jnp.sum version
        # was O(kept x cameras) round trips through the tunneled runtime)
        import numpy as np
        over_all = np.zeros(kept + 1, dtype=np.int64)
        for c in covers:
            hist = np.asarray(jnp.bincount(
                jnp.clip(c, 0, kept).astype(jnp.int32), length=kept + 1))
            over_all = np.maximum(over_all, n - np.cumsum(hist))
        base_slots = kept * n
        best = base_slots
        for s in range(2, kept - 1, 2):
            over = int(over_all[s])
            rows = min(n, _round_up(int(math.ceil(over * headroom)), 128))
            slots = s * n + rows * (kept - s)
            if slots < best:
                best, split, frac = slots, s, rows / n
        if best > 0.75 * base_slots:
            split, frac = 0, 0.0

    cfg = dataclasses.replace(
        base,
        max_tiles_per_gaussian=kept,
        # enumerate the full bbox only when the cull buys slot reduction
        bbox_tiles_per_gaussian=bbox if bbox > kept else 0,
        tile_capacity=_round_up(int(math.ceil(max_count * headroom)), 128),
        two_tier_split=split,
        two_tier_spill_frac=frac,
    )
    if gate_db is not None:
        cfg = dataclasses.replace(
            cfg, tile_capacity=_gate_capacity(gaussians, cameras, cfg,
                                              gate_db))
    return cfg


def _gate_capacity(gaussians: Gaussians, cameras: Sequence[Camera],
                   cfg: RenderConfig, gate_db: float) -> int:
    """Smallest K (power-of-two-ish multiple of 128, >= 128) whose
    render matches the full-demand-capacity render above gate_db on
    EVERY measured camera. Single-tier probe configs (the two-tier
    split only changes sort work, not the kept entries)."""
    from robosimgs_tpu.render.tiled import composite_tiled
    import jax

    k_full = cfg.tile_capacity

    def render(cam, k):
        c = dataclasses.replace(cfg, tile_capacity=k, tile_chunk=0,
                                two_tier_split=0)
        proj = project(gaussians, cam, c)
        return composite_tiled(proj, cam.width, cam.height, c)["rgb"]

    refs = [jax.device_get(render(cam, k_full)) for cam in cameras]
    candidates = []
    k = 128
    while k < k_full:
        candidates.append(k)
        k *= 2
    for k in candidates:
        ok = True
        for cam, ref in zip(cameras, refs):
            out = jax.device_get(render(cam, k))
            mse = float(((out - ref) ** 2).mean())
            psnr = 10.0 * math.log10(1.0 / max(mse, 1e-12))
            if psnr < gate_db:
                ok = False
                break
        if ok:
            return k
    return k_full
