"""Rasterization semantics + capacity configuration.

The numeric thresholds pin down the exact compositing semantics shared by
the pure-jnp reference path and the Pallas TPU path, chosen to match the
reference 3DGS rasterizer that RoboSimGS delegates to via Nerfstudio
(`/root/reference/README.md:73-75`, SURVEY.md §3.4):

  * alpha = min(alpha_clamp, opacity * exp(-sigma)), clamp 0.99
  * contributions with alpha < alpha_min (1/255) are skipped
  * front-to-back compositing stops *before* the contribution that would
    bring transmittance T below transmittance_min (1e-4)
  * 2D covariance gets a +blur (0.3 px^2) isotropic low-pass
  * a Gaussian only contributes to pixels of tiles its radius bbox
    touches (radius = radius_factor * sqrt(max eigenvalue of cov2d)) —
    this tile test is applied in BOTH paths so they agree bitwise in
    structure, not just approximately.

Capacity fields make every shape static for XLA: max tiles per Gaussian
(`max_tiles_per_gaussian`) and per-tile bin capacity (`tile_capacity`).
Overflow is counted and reported, never silently corrupting the image
ordering (closest-in-depth entries win; see render/binning.py).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    tile_size: int = 16
    radius_factor: float = 3.0
    # exact ellipse-tile intersection culling in the packed binning
    # path: a bbox tile where min over the tile's pixel rect of the
    # quadratic form q exceeds log(opacity/alpha_min) has alpha <
    # alpha_min at EVERY pixel — the kernels' keep-mask zeroes such
    # entries (values and grads), so dropping them at binning time is
    # lossless and shrinks per-tile counts (fewer kernel blocks).
    exact_tile_cull: bool = True
    alpha_clamp: float = 0.99
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1.0e-4
    blur: float = 0.3
    near: float = 0.01
    # mip-splatting-style opacity compensation: scales opacity by
    # sqrt(det(cov2d)/det(cov2d+blur)) so the low-pass blur doesn't
    # brighten small splats (gsplat "antialiased" rasterize mode)
    antialiased: bool = False
    # absgrad densification signal (gsplat absgrad / splatfacto):
    # the Pallas backward additionally accumulates the per-PIXEL
    # absolute screen-space gradient |dL/dmean2d| (signed sums cancel
    # on symmetric residuals and under-densify); exposed as the
    # gradient of Projected.abs_probe. Only the pallas compositor
    # computes it.
    absgrad: bool = False
    # evaluate the per-(pixel, gaussian) quadratic form q on the MXU:
    # q is quadratic in (px, py), so a lane block's q is ONE
    # (P,8)x(8,BK) matmul against per-gaussian coefficients instead of
    # ~8 VPU ops on (P,BK) — the roofline's top unharvested candidate
    # (docs/NEXT.md). Values differ from the per-pixel path at f32
    # rounding level (tile-local coords keep the moments small);
    # parity-gated in tests. The backward keeps the per-pixel path
    # under absgrad (it needs dx/dy per pixel there).
    alpha_mxu: bool = False
    # render a camera-space normal map: each splat's unit normal (the
    # rotated axis of its SMALLEST scale, oriented toward the camera)
    # rides the free feat rows 5/6 (+7 when absgrad doesn't need it)
    # through the same alpha-weighted compositing as color, and the
    # output dict gains "normal" (H, W, 3) unit vectors. Feeds the
    # 2DGS-style normal-consistency regularizer (train/trainer.py
    # normal_lambda). Tiled/Pallas compositors only.
    render_normals: bool = False
    # static capacities (overflow/truncation is counted in BinStats,
    # never silent; raise these for scenes with very large splats)
    max_tiles_per_gaussian: int = 32
    # bbox tiles enumerated per gaussian before the exact cull
    # (0 = max_tiles_per_gaussian). When larger, surviving tiles are
    # row-compacted down to max_tiles_per_gaussian slots, so the sort
    # runs over SURVIVOR capacity while the bbox can be bigger — set
    # via autotune (bbox max) to shrink sort work on wide-splat scenes.
    bbox_tiles_per_gaussian: int = 0
    # two-tier sort slots: most gaussians cover few tiles, so the
    # N*max_tiles key sort is mostly sentinel padding. With split s > 0,
    # every gaussian contributes its first s (row-sorted) tile slots and
    # only the top spill_frac*N widest gaussians (by survivor cover,
    # lax.top_k) contribute the remaining max_tiles - s slots — one
    # combined key sort over ~ (s + spill_frac*(max_tiles-s))*N slots
    # instead of max_tiles*N. Exact whenever the spill tier holds every
    # gaussian with cover > s (dropped spill is counted in BinStats,
    # never silent). 0 = off.
    two_tier_split: int = 0
    two_tier_spill_frac: float = 0.25
    tile_capacity: int = 1024
    # VMEM-resident entries per compositing pass; the Pallas kernels
    # stream ceil(tile_capacity / tile_chunk) chunks per tile with
    # carried (color, transmittance) state, so tile_capacity is bounded
    # by HBM, not VMEM, and overflow compositing is exact. 0 = whole
    # capacity in one chunk. Must divide tile_capacity; multiple of 128.
    tile_chunk: int = 0
    # reference-path pixel block rows processed at once (memory knob)
    ref_rows_per_block: int = 32
    ref_gaussian_chunk: int = 512
