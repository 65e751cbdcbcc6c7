"""Adaptive density control under static shapes (SURVEY.md hard part #4).

The 3DGS densify/clone/split/prune/opacity-reset controller (the role of
splatfacto's refinement stage in the reference pipeline), re-designed
for XLA: the Gaussian arrays are a fixed-capacity pool with an `alive`
mask, and a densification round is one jitted scatter program —

  * screen-space gradient statistics are accumulated per step from the
    gradient of the `means2d_offset` probe (render/project.py);
  * growth candidates (avg grad > threshold) are matched to free slots
    by two stable argsorts (candidates by score desc, free slots by
    index) — no dynamic allocation, graceful saturation when the pool
    fills (highest-scoring candidates win);
  * clone copies the Gaussian; split resamples source and child inside
    the parent ellipsoid and shrinks scales by 1.6x;
  * prune kills low-opacity / oversized Gaussians, freeing their slots
    in the same round.

Optimizer moments of every touched slot are zeroed by the caller via
`spawn_mask` (train/optim.py: reset_slots_in_opt_state).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from robosimgs_tpu.core.math3d import quat_to_rotmat
from robosimgs_tpu.core.types import Gaussians


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 2.0e-4       # on NDC-normalized screen grads
    percent_dense: float = 0.01          # split-vs-clone size boundary (x extent)
    split_scale_shrink: float = 1.6
    prune_opacity: float = 0.005
    prune_scale3d_max: float = 0.1       # x extent; 0 disables
    prune_scale3d_after: int = 3000      # size-pruning only after this step
                                         # (3DGS semantics: early training
                                         # legitimately uses large splats
                                         # to cover sparse initializations)
    prune_radii2d_max: float = 0.0       # pixels; 0 disables
    reset_opacity_value: float = 0.01


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyState:
    grad_accum: jax.Array   # (N,) sum of NDC grad norms
    count: jax.Array        # (N,) frames the gaussian was visible in
    max_radii: jax.Array    # (N,) max screen radius seen (pixels)

    @staticmethod
    def zero(capacity: int) -> "DensifyState":
        return DensifyState(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            count=jnp.zeros((capacity,), jnp.int32),
            max_radii=jnp.zeros((capacity,), jnp.float32),
        )


def update_stats(state: DensifyState, grad2d: jax.Array, radii: jax.Array,
                 valid: jax.Array, width: int, height: int) -> DensifyState:
    """Accumulate screen-space gradient stats after one backward pass.

    grad2d: (N, 2) pixel-space gradient of the loss w.r.t. means2d
    (from the means2d_offset probe), converted to NDC-space gradients so
    grad_threshold keeps its standard 3DGS meaning: u_px = (ndc+1)*W/2,
    so dL/dndc = dL/du_px * W/2 (chain rule; NOT 2/W — the inverted
    factor silently suppressed densification by ~(W/2)^2).
    """
    g = jnp.stack([grad2d[:, 0] * (width / 2.0), grad2d[:, 1] * (height / 2.0)], -1)
    norm = jnp.linalg.norm(g, axis=-1)
    return DensifyState(
        grad_accum=state.grad_accum + jnp.where(valid, norm, 0.0),
        count=state.count + valid.astype(jnp.int32),
        max_radii=jnp.maximum(state.max_radii, jnp.where(valid, radii, 0.0)),
    )


def densify_and_prune(
    g: Gaussians,
    state: DensifyState,
    key: jax.Array,
    cfg: DensifyConfig,
    scene_extent: float,
    enable_scale_prune: bool = True,
    return_info: bool = False,
) -> Tuple[Gaussians, DensifyState, jax.Array]:
    """One densification round. Returns (gaussians, reset state, spawn_mask);
    with return_info=True additionally a {"requested", "spawned",
    "pruned"} dict so pool-saturation truncation is counted, never
    silent (repo convention) — the sharded trainer sums these over
    shards into its densify metrics.

    enable_scale_prune: size-based pruning (scale/screen-radius caps)
    gates on cfg.prune_scale3d_after in the trainer — pruning large
    splats from the first round collapses sparse initializations (the
    splats covering a sparse scene are *supposed* to be big early)."""
    n = g.capacity
    avg = state.grad_accum / jnp.maximum(state.count, 1).astype(jnp.float32)
    scales = g.scales()
    max_scale = jnp.max(scales, axis=-1)
    opac = g.opacities()

    prune = g.alive & (opac < cfg.prune_opacity)
    if enable_scale_prune and cfg.prune_scale3d_max > 0:
        prune |= g.alive & (max_scale > cfg.prune_scale3d_max * scene_extent)
    if enable_scale_prune and cfg.prune_radii2d_max > 0:
        prune |= g.alive & (state.max_radii > cfg.prune_radii2d_max)

    grow = g.alive & ~prune & (avg > cfg.grad_threshold) & (state.count > 0)
    big = max_scale > cfg.percent_dense * scene_extent
    split = grow & big
    # (clone = grow & ~big: the child is an exact copy; distinguished
    # below only by whether positions get resampled.)

    # Match spawn requests to free slots via two stable argsorts.
    scores = jnp.where(grow, avg, -jnp.inf)
    cand_order = jnp.argsort(-scores)                      # requests first, best first
    free = ~g.alive | prune
    free_order = jnp.argsort(jnp.where(free, 0, 1))        # free slots first
    n_req = jnp.sum(grow)
    n_free = jnp.sum(free)
    k = jnp.arange(n)
    do = (k < n_req) & (k < n_free)
    src = cand_order
    dst = free_order

    # Sample split offsets inside the parent ellipsoid.
    k1, k2 = jax.random.split(key)
    R = quat_to_rotmat(g.normalized_quats())               # (N, 3, 3)
    e_child = jax.random.normal(k1, (n, 3)) * scales
    e_src = jax.random.normal(k2, (n, 3)) * scales
    off_child = jnp.einsum("nij,nj->ni", R, e_child)
    off_src = jnp.einsum("nij,nj->ni", R, e_src)
    split_log_shrink = jnp.log(cfg.split_scale_shrink)

    # Child values (gathered from source, adjusted if split).
    is_split_src = split[src]
    child_means = g.means[src] + jnp.where(is_split_src[:, None], off_child[src], 0.0)
    child_log_scales = g.log_scales[src] - jnp.where(is_split_src[:, None], split_log_shrink, 0.0)

    def scatter(x, upd):
        return x.at[dst].set(jnp.where(do.reshape((-1,) + (1,) * (x.ndim - 1)), upd, x[dst]))

    new = g
    # kill pruned first
    alive = g.alive & ~prune
    means = scatter(g.means, child_means)
    log_scales = scatter(g.log_scales, child_log_scales)
    quats = scatter(g.quats, g.quats[src])
    logit_op = scatter(g.logit_opacities, g.logit_opacities[src])
    sh_dc = scatter(g.sh_dc, g.sh_dc[src])
    sh_rest = scatter(g.sh_rest, g.sh_rest[src])
    alive = alive.at[dst].set(jnp.where(do, True, alive[dst]))

    # In-place modification of split sources that actually spawned.
    src_modified = jnp.zeros((n,), bool).at[src].set(do & is_split_src)
    means = jnp.where(src_modified[:, None], means + off_src, means)
    log_scales = jnp.where(src_modified[:, None], log_scales - split_log_shrink, log_scales)

    new = g.replace(means=means, quats=quats, log_scales=log_scales,
                    logit_opacities=logit_op, sh_dc=sh_dc, sh_rest=sh_rest,
                    alive=alive)

    spawn_mask = jnp.zeros((n,), bool).at[dst].set(do) | src_modified | prune
    if return_info:
        info = {"requested": n_req, "spawned": jnp.minimum(n_req, n_free),
                "pruned": jnp.sum(prune)}
        return new, DensifyState.zero(n), spawn_mask, info
    return new, DensifyState.zero(n), spawn_mask


def compact_and_resize(g: Gaussians, opt_state, dstate: DensifyState,
                       new_capacity: int):
    """Alive-prefix compaction + pool resize (SURVEY.md hard part #4).

    One jitted permutation moves live Gaussians to a prefix (stable, so
    relative order — and therefore training semantics — is preserved)
    and slices/pads every capacity-leading array (parameters, Adam
    moments, densify statistics) to `new_capacity`. The trainer calls
    this at densify boundaries so per-step optimizer/projection work
    scales with the ALIVE count, not a fixed worst-case pool: a
    1M-capacity pool with 200k alive Gaussians pays for ~400k slots
    (alive + spawn headroom) instead of 1M every Adam step.

    `new_capacity` is static — each distinct value compiles its own
    train step, so callers round it to a bucket (TrainConfig.pool_bucket)
    to bound retraces. Returns (gaussians, opt_state, densify_state).
    """
    n = g.capacity
    perm = jnp.argsort(~g.alive, stable=True)

    def fix(x):
        if not (isinstance(x, jax.Array) and x.ndim >= 1 and x.shape[0] == n):
            return x
        y = x[perm]
        if new_capacity <= n:
            return y[:new_capacity]
        pad = jnp.zeros((new_capacity - n,) + x.shape[1:], x.dtype)
        return jnp.concatenate([y, pad], axis=0)

    g2 = jax.tree_util.tree_map(fix, g)
    if new_capacity > n:
        # dead-slot padding: identity quat (normalized_quats is clip-
        # guarded, but keep padding consistent with from_points) and
        # tiny log-scale; alive pads False (bool zeros) automatically
        g2 = g2.replace(
            quats=g2.quats.at[n:, 0].set(1.0),
            log_scales=g2.log_scales.at[n:].set(-5.0))
    opt2 = jax.tree_util.tree_map(fix, opt_state)
    d2 = jax.tree_util.tree_map(fix, dstate)
    return g2, opt2, d2


def reset_opacities(g: Gaussians, value: float = 0.01) -> Gaussians:
    """Periodic opacity clamp-down (3DGS opacity reset)."""
    cap = jnp.log(value / (1.0 - value))
    return g.replace(logit_opacities=jnp.minimum(g.logit_opacities, cap))
