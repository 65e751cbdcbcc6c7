"""Sharded training step: DP over cameras x tile-sharded rasterization.

The pod-slice scaling design (SURVEY.md §2.3): the 'data' mesh axis
shards the camera batch (gradients all-reduced across it — GSPMD emits
the collective, overlapped with backward by the XLA scheduler); the
'tile' axis shards image rows of each frame (the SP/CP analog), with
Gaussian parameters replicated and each rank rasterizing only its row
strip through a principal-point-shifted crop camera. The loss is
computed on the all-gathered full frame (so SSIM windows crossing strip
boundaries are exact); the gather's transpose routes pixel cotangents
back to the owning rank, and per-Gaussian gradients are psum'd over
'tile' + pmean'd over 'data'.

Written with shard_map (not vmap) so the Pallas per-tile kernels run
unbatched on every device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.train.densify import DensifyState
from robosimgs_tpu.train.losses import photometric_loss, psnr
from robosimgs_tpu.train.optim import float_params, make_optimizer
from robosimgs_tpu.train.trainer import TrainConfig, TrainState, _sh_mask


def stack_cameras(cams: List[Camera]) -> Camera:
    """Stack cameras into one batched Camera pytree (equal resolutions)."""
    assert len({(c.width, c.height) for c in cams}) == 1
    arrays = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    return arrays


def _index_camera(cam_batch: Camera, i) -> Camera:
    return jax.tree_util.tree_map(lambda x: x[i], cam_batch)


def _crop_camera_rows(cam: Camera, row0, rows: int) -> Camera:
    """Camera viewing only rows [row0, row0+rows): shift cy."""
    return dataclasses.replace(cam, cy=cam.cy - row0, height=rows)


def make_dp_train_step(cfg: TrainConfig, mesh: Mesh, impl: str = "tiled",
                       return_grads: bool = False) -> Callable:
    """Returns train_step(state, cam_batch, targets) -> (state, metrics).

    cam_batch: batched Camera with leading dim B (B % n_data == 0);
    targets: (B, H, W, 3). Image height must divide n_tile.
    """
    optimizer = make_optimizer(cfg.optim, cfg.scene_extent)
    n_data = mesh.shape["data"]
    n_tile = mesh.shape["tile"]

    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.reference import composite_reference
    from robosimgs_tpu.render.tiled import composite_tiled

    def per_device(state: TrainState, cam_batch: Camera, targets: jax.Array):
        g = state.gaussians
        mask = _sh_mask(state.step, cfg.sh_warmup_every, g.sh_rest.shape[1])
        tile_rank = jax.lax.axis_index("tile")
        b_local = targets.shape[0]
        H = cam_batch.height  # static full height
        rows = H // n_tile
        bg = jnp.asarray(cfg.background, jnp.float32)

        def render_loss_one(params, offset, cam: Camera, target):
            p = g.replace(**{**params, "sh_rest": params["sh_rest"] * mask})
            crop = _crop_camera_rows(cam, tile_rank * rows, rows)
            proj = project(p, crop, cfg.render, means2d_offset=offset,
                           tan_half_fov=cam.tan_half_fov)
            if impl == "reference":
                out = composite_reference(proj, crop.width, rows, cfg.render, bg)
            else:
                out = composite_tiled(proj, crop.width, rows, cfg.render, bg)
            rgb_full = jax.lax.all_gather(out["rgb"], "tile", axis=0, tiled=True)
            loss = photometric_loss(rgb_full, target, cfg.ssim_lambda)
            return loss, (rgb_full, proj.radii, proj.valid)

        def loss_fn(params, offset):
            def one(i, acc):
                cam = _index_camera(cam_batch, i)
                (l, aux) = render_loss_one(params, offset, cam, targets[i])
                loss_acc, psnr_acc, radii_acc, valid_acc = acc
                return (loss_acc + l / b_local,
                        psnr_acc + psnr(aux[0], targets[i]) / b_local,
                        jnp.maximum(radii_acc, aux[1]),
                        valid_acc | aux[2])

            init = (jnp.float32(0), jnp.float32(0),
                    jnp.zeros((g.capacity,), jnp.float32),
                    jnp.zeros((g.capacity,), bool))
            loss, psnr_v, radii, valid = jax.lax.fori_loop(0, b_local, one, init)
            return loss, (psnr_v, radii, valid)

        params = float_params(g)
        offset = jnp.zeros((g.capacity, 2), jnp.float32)
        (loss, (psnr_v, radii, valid)), (p_grads, offset_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offset)

        # Gradient all-reduce. Over 'tile' the reduction is a *mean*, not
        # a sum: the loss is computed redundantly on every tile rank from
        # the all-gathered frame, and all_gather's transpose already sums
        # the identical per-rank cotangents (reduce-scatter), so each
        # rank's grads carry an extra n_tile factor. Over 'data' camera
        # shards are averaged (the global loss is the batch mean).
        p_grads = jax.lax.pmean(p_grads, "tile")
        p_grads = jax.lax.pmean(p_grads, "data")
        offset_grad = jax.lax.pmean(offset_grad, "tile")
        offset_grad = jax.lax.pmean(offset_grad, "data")
        radii = jax.lax.pmax(jax.lax.pmax(radii, "tile"), "data")
        valid = jax.lax.psum(valid.astype(jnp.int32), "tile") > 0
        valid = jax.lax.psum(valid.astype(jnp.int32), "data") > 0
        loss = jax.lax.pmean(jax.lax.pmean(loss, "tile"), "data")
        psnr_v = jax.lax.pmean(jax.lax.pmean(psnr_v, "tile"), "data")

        from robosimgs_tpu.train.densify import update_stats
        dstate = update_stats(state.densify_state, offset_grad, radii, valid,
                              cam_batch.width, H)

        updates, opt_state = optimizer.update(p_grads, state.opt_state, params)
        import optax
        new_params = optax.apply_updates(params, updates)
        new_g = g.replace(**new_params)
        new_state = TrainState(gaussians=new_g, opt_state=opt_state,
                               densify_state=dstate, step=state.step + 1,
                               key=state.key)
        metrics = {"loss": loss, "psnr": psnr_v, "n_alive": new_g.num_alive}
        if return_grads:
            metrics["grads"] = p_grads
        return new_state, metrics

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, cam_batch, targets):
        return sharded(state, cam_batch, targets)

    return train_step


# -- gaussian-sharded training (the TP/ZeRO analog, SURVEY.md §2.3) -------


def _leading_dim_specs(tree, n: int, axis_name: str):
    """P(axis_name) for every leaf whose leading dim == n, else P()."""
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
            return P(axis_name)
        return P()
    return jax.tree_util.tree_map(spec, tree)


def make_gaussian_sharded_train_step(cfg: TrainConfig, mesh: Mesh,
                                     impl: str = "tiled",
                                     return_grads: bool = False,
                                     gather: str = "all_gather") -> Callable:
    """Train step with the GAUSSIAN SET sharded over the 'data' axis.

    The memory-scaling strategy for beyond-HBM scenes (BASELINE.md
    config 5, SURVEY.md §2.3 "TP" row): parameters, Adam moments, and
    densify statistics live sharded; each device projects only its
    shard (O(N/n) work), then all-gathers the compact *projected*
    splats (16 floats/gaussian vs 59+ raw parameters) so every tile
    rank composites its image rows against the full set. The
    all_gather's transpose reduce-scatters pixel cotangents straight
    back to the owning shard, so per-Gaussian gradients and the Adam
    update never materialize unsharded. One camera per step
    (replicated).

    Gradient bookkeeping: the loss is computed redundantly on every
    device; the 'data' all_gather transpose sums n_shard identical
    cotangents and the 'tile' transpose sums n_tile, so each device
    holds n_shard*n_tile * dL_t/dshard where L_t is its own rows'
    contribution. The true shard gradient is psum over 'tile' divided
    by n_shard*n_tile.

    gather: "all_gather" (default — project the local shard, all-gather
    the compact projected splats; the small-scene fast path) or "ring"
    (never materialize the full set: raw parameter chunks rotate around
    the 'data' ring via lax.ppermute and each tile rank merges top-K
    per-tile candidates — per-device memory O(N/n_shard), the
    beyond-HBM path; see parallel/ring.py). "ring" requires the tiled
    impl (it produces pre-gathered tile blocks directly).

    Returns train_step(state, camera, target) -> (state, metrics);
    state arrays with leading dim == capacity are sharded on 'data'.
    """
    import optax

    from robosimgs_tpu.parallel.ring import ring_render_rows
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.reference import composite_reference
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.densify import update_stats
    from robosimgs_tpu.train.optim import FLOAT_FIELDS

    if gather == "ring" and impl != "tiled":
        raise ValueError("gather='ring' requires impl='tiled'")

    optimizer = make_optimizer(cfg.optim, cfg.scene_extent)
    n_shard = mesh.shape["data"]
    n_tile = mesh.shape["tile"]

    def per_device(state: TrainState, camera: Camera, target: jax.Array):
        g = state.gaussians                      # local shard
        mask = _sh_mask(state.step, cfg.sh_warmup_every, g.sh_rest.shape[1])
        tile_rank = jax.lax.axis_index("tile")
        H = camera.height
        rows = H // n_tile
        bg = jnp.asarray(cfg.background, jnp.float32)

        def loss_fn(params, offset):
            masked = {**params, "sh_rest": params["sh_rest"] * mask}
            crop = _crop_camera_rows(camera, tile_rank * rows, rows)
            if gather == "ring":
                out = ring_render_rows(masked, g.alive, offset, camera,
                                       tile_rank, n_tile, cfg.render, bg,
                                       "data", n_shard)
                # densify stats (radii/valid of the local shard) ride the
                # ring's hop-0 side channel — no extra projection.
                proj_radii, proj_valid = out["radii"], out["valid"]
            else:
                p = g.replace(**masked)
                proj_local = project(p, crop, cfg.render,
                                     means2d_offset=offset,
                                     tan_half_fov=camera.tan_half_fov)
                proj = jax.tree_util.tree_map(
                    lambda x: jax.lax.all_gather(x, "data", axis=0, tiled=True),
                    proj_local)
                if impl == "reference":
                    out = composite_reference(proj, crop.width, rows,
                                              cfg.render, bg)
                else:
                    out = composite_tiled(proj, crop.width, rows,
                                          cfg.render, bg)
                proj_radii, proj_valid = proj_local.radii, proj_local.valid
            rgb_full = jax.lax.all_gather(out["rgb"], "tile", axis=0, tiled=True)
            loss = photometric_loss(rgb_full, target, cfg.ssim_lambda)
            return loss, (psnr(rgb_full, target), proj_radii, proj_valid)

        params = float_params(g)
        offset = jnp.zeros((g.capacity, 2), jnp.float32)
        (loss, (psnr_v, radii, valid)), (p_grads, offset_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, offset)

        scale = 1.0 / (n_shard * n_tile)
        p_grads = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x * scale, "tile"), p_grads)
        offset_grad = jax.lax.psum(offset_grad * scale, "tile")
        radii = jax.lax.pmax(radii, "tile")
        valid = jax.lax.psum(valid.astype(jnp.int32), "tile") > 0
        loss = jax.lax.pmean(jax.lax.pmean(loss, "tile"), "data")
        psnr_v = jax.lax.pmean(jax.lax.pmean(psnr_v, "tile"), "data")

        dstate = update_stats(state.densify_state, offset_grad, radii, valid,
                              camera.width, H)
        updates, opt_state = optimizer.update(p_grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_g = g.replace(**new_params)
        new_state = TrainState(gaussians=new_g, opt_state=opt_state,
                               densify_state=dstate, step=state.step + 1,
                               key=state.key)
        metrics = {"loss": loss, "psnr": psnr_v,
                   "n_alive": jax.lax.psum(new_g.num_alive, "data")}
        if return_grads:
            metrics["grads"] = p_grads
        return new_state, metrics

    cache = {}

    def _jitted_for(state):
        treedef = jax.tree_util.tree_structure(state)
        if treedef not in cache:
            cap = state.gaussians.capacity
            state_specs = _leading_dim_specs(
                jax.eval_shape(lambda s: s, state), cap, "data")
            metric_specs = {"loss": P(), "psnr": P(), "n_alive": P()}
            if return_grads:
                metric_specs["grads"] = {k: P("data") for k in FLOAT_FIELDS}
            sharded = jax.shard_map(
                per_device, mesh=mesh,
                in_specs=(state_specs, P(), P()),
                out_specs=(state_specs, metric_specs),
                check_vma=False)
            cache[treedef] = jax.jit(sharded, donate_argnums=(0,))
        return cache[treedef]

    def train_step(state, camera, target):
        return _jitted_for(state)(state, camera, target)

    # AOT access (memory-evidence tooling): step.jitted_for(state)
    # .lower(...).compile().memory_analysis() reads XLA's per-device
    # buffer assignment without running a step
    train_step.jitted_for = _jitted_for
    return train_step


# -- densify / compaction under the gaussian-sharded pool ------------------
# (SURVEY.md §7 hard parts #4/#5: "re-sharding after topology changes" —
# without these the sharded trainers can only step a fixed pool, never
# grow or shrink it, so the beyond-HBM config is a demo, not a trainer.)


def make_sharded_densify_step(cfg: TrainConfig, mesh: Mesh) -> Callable:
    """Densify/prune with the Gaussian pool sharded over 'data'.

    PER-SHARD spawn with capacity kept shard-uniform: every shard runs
    the single-device controller (train/densify.py::densify_and_prune —
    elementwise grow/prune decisions, local argsort slot matching) on
    its own capacity/n_shard slots, so the round is embarrassingly
    parallel — zero collectives on the parameter arrays, only a scalar
    psum for the accounting. Semantics vs the global controller: the
    grow/prune DECISIONS are identical (they are per-gaussian
    thresholds); only slot ASSIGNMENT is shard-local, so a full shard
    saturates (highest-scoring candidates win, counted in the returned
    info) even if another shard has free slots. The densify-boundary
    compaction (make_sharded_compact) rebalances capacity; spawn
    imbalance across shards is bounded by the spatially-interleaved
    initial sharding.

    RNG: the round key is folded with the shard index so split offsets
    are independent across shards; state.key advances identically on
    every shard (stays replicated).

    Returns densify_step(state, enable_scale_prune=True) ->
    (state, info) with info = {"requested", "spawned", "pruned"} summed
    over shards — pool-saturation truncation is counted, never silent.
    """
    from robosimgs_tpu.train.densify import densify_and_prune
    from robosimgs_tpu.train.optim import reset_slots_in_opt_state

    cache = {}

    def densify_step(state, enable_scale_prune: bool = True):
        ck = (jax.tree_util.tree_structure(state), bool(enable_scale_prune))
        if ck not in cache:
            esp = bool(enable_scale_prune)

            def per_device(state):
                key, sub = jax.random.split(state.key)
                sub = jax.random.fold_in(sub, jax.lax.axis_index("data"))
                g, dstate, spawn, info = densify_and_prune(
                    state.gaussians, state.densify_state, sub, cfg.densify,
                    cfg.scene_extent, enable_scale_prune=esp,
                    return_info=True)
                opt_state = reset_slots_in_opt_state(state.opt_state, spawn)
                info = {k: jax.lax.psum(v, "data") for k, v in info.items()}
                new_state = dataclasses.replace(
                    state, gaussians=g, opt_state=opt_state,
                    densify_state=dstate, key=key)
                return new_state, info

            cap = state.gaussians.capacity
            state_specs = _leading_dim_specs(
                jax.eval_shape(lambda s: s, state), cap, "data")
            info_specs = {"requested": P(), "spawned": P(), "pruned": P()}
            sharded = jax.shard_map(
                per_device, mesh=mesh, in_specs=(state_specs,),
                out_specs=(state_specs, info_specs), check_vma=False)
            cache[ck] = jax.jit(sharded, donate_argnums=(0,))
        return cache[ck](state)

    return densify_step


def make_sharded_compact(mesh: Mesh) -> Callable:
    """Alive-prefix compaction + pool resize under the sharded pool.

    Each shard independently compacts its live Gaussians to a prefix
    and slices/pads to `new_local_capacity` slots (shard-uniform, so
    the global pool stays evenly sharded over 'data' — the re-sharding
    after topology changes of SURVEY.md hard part #5 without any
    cross-device traffic: relative order within a shard is preserved,
    optimizer moments and densify stats move with their slots, exactly
    train/densify.py::compact_and_resize per shard).

    Callers pick new_local_capacity from the MAX per-shard alive count
    (see sharded_pool_target) so no shard truncates; each distinct
    value compiles once (bucket it like TrainConfig.pool_bucket).

    Returns compact(state, new_local_capacity) -> state.
    """
    from robosimgs_tpu.train.densify import compact_and_resize

    cache = {}

    def compact(state, new_local_capacity: int):
        ck = (jax.tree_util.tree_structure(state), int(new_local_capacity))
        if ck not in cache:
            nlc = int(new_local_capacity)

            def per_device(state):
                g, opt, d = compact_and_resize(
                    state.gaussians, state.opt_state, state.densify_state,
                    nlc)
                return dataclasses.replace(state, gaussians=g, opt_state=opt,
                                           densify_state=d)

            cap = state.gaussians.capacity
            in_specs = _leading_dim_specs(
                jax.eval_shape(lambda s: s, state), cap, "data")
            # compaction preserves the tree structure; only the leading
            # (capacity) dim changes, so the same specs describe the out
            sharded = jax.shard_map(per_device, mesh=mesh,
                                    in_specs=(in_specs,),
                                    out_specs=in_specs, check_vma=False)
            cache[ck] = jax.jit(sharded)
        return cache[ck](state)

    return compact


def sharded_pool_target(state, mesh: Mesh, headroom: float,
                        bucket: int, local_max: int) -> int:
    """Per-shard capacity for the next compaction: bucket-rounded
    max-over-shards alive count with spawn headroom, clamped to
    [bucket, local_max]. Syncs the device (call at densify boundaries
    only, like Trainer._maybe_resize_pool)."""
    n_shard = mesh.shape["data"]
    alive = np.asarray(jax.device_get(state.gaussians.alive))
    per_shard = alive.reshape(n_shard, -1).sum(1)
    want = int(per_shard.max() * (1.0 + headroom)) + 1
    want = -(-want // bucket) * bucket
    return max(bucket, min(want, local_max))
