import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.parallel.distributed import make_dp_train_step, stack_cameras
from robosimgs_tpu.parallel.mesh import make_mesh
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.rasterize import rasterize
from robosimgs_tpu.train.data import synthetic_scene
from robosimgs_tpu.train.densify import DensifyState
from robosimgs_tpu.train.losses import photometric_loss
from robosimgs_tpu.train.optim import float_params, make_optimizer
from robosimgs_tpu.train.trainer import TrainConfig, TrainState


def setup(n_cams=4, n=40, wh=(32, 32)):
    cfg = TrainConfig(render=RenderConfig(tile_capacity=128, ref_gaussian_chunk=64),
                      scene_extent=1.0, impl="reference")
    gt, frames = synthetic_scene(seed=0, n_gaussians=n, n_cameras=n_cams,
                                 width=wh[0], height=wh[1], sh_degree=1)
    targets = []
    for f in frames:
        targets.append(np.asarray(rasterize(gt, f.camera, cfg.render, impl="reference")["rgb"]))
    init = Gaussians.random(jax.random.PRNGKey(7), n, sh_degree=1)
    optimizer = make_optimizer(cfg.optim, cfg.scene_extent)
    state = TrainState(
        gaussians=init, opt_state=optimizer.init(float_params(init)),
        densify_state=DensifyState.zero(init.capacity),
        step=jnp.asarray(0, jnp.int32), key=jax.random.PRNGKey(0))
    return cfg, frames, targets, state, optimizer


@pytest.mark.parametrize("mesh_shape", [(4, 2), (4, 1), (2, 4)])
def test_dp_tile_step_matches_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    cfg, frames, targets, state, optimizer = setup(n_cams=mesh_shape[0])
    mesh = make_mesh(*mesh_shape)
    step_fn = make_dp_train_step(cfg, mesh, impl="reference", return_grads=True)
    cam_batch = stack_cameras([f.camera for f in frames])
    tgt = jnp.asarray(np.stack(targets))

    state_copy = jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    new_state, metrics = step_fn(state_copy, cam_batch, tgt)

    # manual single-device equivalent: mean loss over the 4 cameras
    g = state.gaussians

    def loss_fn(params):
        # match the dp step's SH warm-up masking (step 0: rest bands off)
        p = g.replace(**{**params, "sh_rest": params["sh_rest"] * 0.0})
        total = 0.0
        for f, t in zip(frames, targets):
            out = rasterize(p, f.camera, cfg.render, impl="reference")
            total = total + photometric_loss(out["rgb"], jnp.asarray(t), cfg.ssim_lambda)
        return total / len(frames)

    params = float_params(g)
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(metrics["loss"]), float(loss_ref), rtol=1e-5)
    # gradients must agree across shardings (params diverge at Adam's
    # sign(g)*lr first step wherever |g| is at numerical-noise level,
    # so the comparison happens pre-optimizer)
    for k in grads_ref:
        np.testing.assert_allclose(
            np.asarray(metrics["grads"][k]), np.asarray(grads_ref[k]),
            atol=2e-6, err_msg=f"{k} (mesh {mesh_shape})")
    assert int(new_state.step) == 1


def test_dp_step_runs_with_pallas_interpret():
    cfg, frames, targets, state, _ = setup()
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    step_fn = make_dp_train_step(cfg, mesh, impl="tiled")
    # batch of 2 cameras on 2-way data axis
    cam_batch = stack_cameras([frames[0].camera, frames[1].camera])
    tgt = jnp.asarray(np.stack(targets[:2]))
    new_state, metrics = step_fn(state, cam_batch, tgt)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_gaussian_sharded_step_matches_single_device():
    """ZeRO-style sharded-gaussian step: gradients for each shard must
    match the corresponding rows of the single-device gradient."""
    from robosimgs_tpu.parallel.distributed import \
        make_gaussian_sharded_train_step

    cfg, frames, targets, state, optimizer = setup(n_cams=1)
    mesh = make_mesh(4, 2)
    step_fn = make_gaussian_sharded_train_step(cfg, mesh, impl="reference",
                                               return_grads=True)
    state_copy = jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    new_state, metrics = step_fn(state_copy, frames[0].camera,
                                 jnp.asarray(targets[0]))

    g = state.gaussians

    def loss_fn(params):
        p = g.replace(**{**params, "sh_rest": params["sh_rest"] * 0.0})
        out = rasterize(p, frames[0].camera, cfg.render, impl="reference")
        return photometric_loss(out["rgb"], jnp.asarray(targets[0]),
                                cfg.ssim_lambda)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(float_params(g))
    np.testing.assert_allclose(float(metrics["loss"]), float(loss_ref), rtol=1e-5)
    for k in grads_ref:
        np.testing.assert_allclose(np.asarray(metrics["grads"][k]),
                                   np.asarray(grads_ref[k]), atol=2e-6,
                                   err_msg=k)
    assert int(metrics["n_alive"]) == int(g.num_alive)
    assert int(new_state.step) == 1


def test_gaussian_sharded_step_with_pallas_interpret():
    """Sharded-gaussian step through the tiled/Pallas path (interpret on
    CPU) — the combination the TPU driver exercises for real."""
    from robosimgs_tpu.parallel.distributed import \
        make_gaussian_sharded_train_step

    cfg, frames, targets, state, _ = setup(n_cams=1)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    step_fn = make_gaussian_sharded_train_step(cfg, mesh, impl="tiled")
    new_state, metrics = step_fn(state, frames[0].camera,
                                 jnp.asarray(targets[0]))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


# -- densify/prune + compaction under the sharded pool ---------------------
# (SURVEY.md §7 hard parts #4/#5: the sharded trainer must GROW and
# re-shard the pool, not just step a fixed capacity.)


def _densify_setup(capacity=64, alive_per_shard=10, n_shard=4,
                   hot_per_shard=3, prune_per_shard=1, seed=3):
    """Sharded-densify fixture: capacity split over n_shard contiguous
    blocks; in each shard the first `alive_per_shard` slots are alive,
    the first `hot_per_shard` of those carry grad stats above threshold
    (clone candidates — scales kept below percent_dense so children are
    exact copies = deterministic across slot assignments), and the LAST
    alive slot is low-opacity (prune candidate)."""
    from robosimgs_tpu.train.densify import DensifyConfig

    rng = np.random.default_rng(seed)
    local = capacity // n_shard
    pts = rng.uniform(-0.5, 0.5, (capacity, 3)).astype(np.float32)
    g = Gaussians.from_points(pts, sh_degree=1, capacity=capacity,
                              init_scale=np.full((capacity,), 0.004,
                                                 np.float32))
    alive = np.zeros((capacity,), bool)
    logit_op = np.asarray(g.logit_opacities).copy()
    grad = np.zeros((capacity,), np.float32)
    count = np.zeros((capacity,), np.int32)
    for s in range(n_shard):
        b = s * local
        alive[b:b + alive_per_shard] = True
        grad[b:b + hot_per_shard] = 1.0
        count[b:b + alive_per_shard] = 1
        for p in range(prune_per_shard):
            logit_op[b + alive_per_shard - 1 - p] = -8.0   # ~0.0003 opacity
    g = g.replace(alive=jnp.asarray(alive),
                  logit_opacities=jnp.asarray(logit_op))
    dstate = DensifyState(grad_accum=jnp.asarray(grad),
                          count=jnp.asarray(count),
                          max_radii=jnp.zeros((capacity,), jnp.float32))
    dcfg = DensifyConfig(grad_threshold=0.5, percent_dense=1.0)  # clone-only
    cfg = TrainConfig(scene_extent=1.0, densify=dcfg, impl="reference")
    optimizer = make_optimizer(cfg.optim, cfg.scene_extent)
    state = TrainState(
        gaussians=g, opt_state=optimizer.init(float_params(g)),
        densify_state=dstate, step=jnp.asarray(5, jnp.int32),
        key=jax.random.PRNGKey(11))
    return cfg, state


def _alive_rows(g):
    """Sorted (lexicographic) stacked rows of every alive gaussian —
    slot-assignment-invariant content signature."""
    alive = np.asarray(g.alive)
    rows = np.concatenate([
        np.asarray(g.means)[alive],
        np.asarray(g.log_scales)[alive],
        np.asarray(g.logit_opacities)[alive][:, None],
        np.asarray(g.sh_dc)[alive]], axis=1)
    return rows[np.lexsort(rows.T[::-1])]


def test_sharded_densify_matches_single_device_clone_only():
    """Per-shard spawn makes the same grow/prune DECISIONS as the
    global controller (they are per-gaussian thresholds); with clone
    children (deterministic) the alive-set CONTENT matches exactly —
    only slot assignment may differ."""
    from robosimgs_tpu.parallel.distributed import make_sharded_densify_step
    from robosimgs_tpu.train.trainer import make_densify_step

    assert len(jax.devices()) >= 8
    cfg, state = _densify_setup()
    mesh = make_mesh(4, 2)

    copy = jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    sharded_state, info = make_sharded_densify_step(cfg, mesh)(copy, True)

    single_state = make_densify_step(cfg)(state, True)

    assert int(info["requested"]) == 4 * 3
    assert int(info["spawned"]) == 4 * 3      # plentiful free slots
    assert int(info["pruned"]) == 4 * 1
    assert int(sharded_state.gaussians.num_alive) == \
        int(single_state.gaussians.num_alive) == 4 * (10 + 3 - 1)
    np.testing.assert_array_equal(_alive_rows(sharded_state.gaussians),
                                  _alive_rows(single_state.gaussians))
    # spawned slots had their Adam moments zeroed (reset_slots_in_opt_state)
    # and the densify stats were reset
    assert float(jnp.abs(sharded_state.densify_state.grad_accum).max()) == 0.0


def test_sharded_densify_saturation_is_counted():
    """A full shard saturates gracefully — and the truncation is
    COUNTED in the returned info (repo convention: never silent)."""
    from robosimgs_tpu.parallel.distributed import make_sharded_densify_step

    # every slot alive, every slot hot: zero free slots anywhere
    cfg, state = _densify_setup(alive_per_shard=16, hot_per_shard=16,
                                prune_per_shard=0)
    mesh = make_mesh(4, 2)
    new_state, info = make_sharded_densify_step(cfg, mesh)(state, True)
    assert int(info["requested"]) == 64
    assert int(info["spawned"]) == 0
    assert int(new_state.gaussians.num_alive) == 64


def test_sharded_compact_and_pool_target():
    """Densify-boundary compaction re-shards to a shard-uniform smaller
    capacity with the alive CONTENT preserved and optimizer moments
    moved alongside their slots."""
    import optax

    from robosimgs_tpu.parallel.distributed import (make_sharded_compact,
                                                    sharded_pool_target)

    cfg, state = _densify_setup()
    mesh = make_mesh(4, 2)
    # make a recognizable optimizer state: one update's worth of moments
    optimizer = make_optimizer(cfg.optim, cfg.scene_extent)
    params = float_params(state.gaussians)
    # slot-identifying moments: mu = 0.1 * param value after one update
    grads = jax.tree_util.tree_map(lambda p: p, params)
    _, opt_state = optimizer.update(grads, state.opt_state, params)
    state = TrainState(gaussians=state.gaussians, opt_state=opt_state,
                       densify_state=state.densify_state, step=state.step,
                       key=state.key)

    before = _alive_rows(state.gaussians)
    local = sharded_pool_target(state, mesh, headroom=0.1, bucket=4,
                                local_max=16)
    assert local == 12                      # ceil(10 * 1.1 + 1 = 12) -> 12
    compacted = make_sharded_compact(mesh)(state, local)
    assert compacted.gaussians.capacity == 4 * local
    np.testing.assert_array_equal(_alive_rows(compacted.gaussians), before)
    # moments followed their slots: each alive slot's mu is still tied
    # to ITS parameter value (mu = (1-b1) * grad with grad = param)
    mu = np.asarray(
        compacted.opt_state.inner_states["means"].inner_state[0].mu["means"])
    alive = np.asarray(compacted.gaussians.alive)
    np.testing.assert_allclose(
        mu[alive], 0.1 * np.asarray(compacted.gaussians.means)[alive],
        rtol=1e-6)


def test_sharded_train_densify_compact_cycle():
    """Full cycle on the virtual mesh: sharded train step -> sharded
    densify -> compaction to a new capacity -> train step continues at
    the new shapes (the dryrun mode-5 flow)."""
    import dataclasses

    from robosimgs_tpu.parallel.distributed import (
        make_gaussian_sharded_train_step, make_sharded_compact,
        make_sharded_densify_step, sharded_pool_target)

    cfg, frames, targets, state, _ = setup(n_cams=1, n=40)
    mesh = make_mesh(4, 2)
    # carve out free slots: the last 4 of every 10-slot shard are dead
    alive = np.asarray(state.gaussians.alive).reshape(4, 10).copy()
    alive[:, 6:] = False
    state = dataclasses.replace(
        state, gaussians=state.gaussians.replace(alive=jnp.asarray(
            alive.reshape(-1))))
    step_fn = make_gaussian_sharded_train_step(cfg, mesh, impl="reference")
    state, m0 = step_fn(state, frames[0].camera, jnp.asarray(targets[0]))

    ds = DensifyState(
        grad_accum=jnp.full((state.gaussians.capacity,), 1.0, jnp.float32),
        count=jnp.ones((state.gaussians.capacity,), jnp.int32),
        max_radii=state.densify_state.max_radii)
    state = dataclasses.replace(state, densify_state=ds)
    state, info = make_sharded_densify_step(cfg, mesh)(state, False)
    assert int(info["spawned"]) > 0
    local = sharded_pool_target(state, mesh, headroom=0.5, bucket=8,
                                local_max=32)
    state = make_sharded_compact(mesh)(state, local)
    assert state.gaussians.capacity == 4 * local

    state, m1 = step_fn(state, frames[0].camera, jnp.asarray(targets[0]))
    assert np.isfinite(float(m1["loss"]))
    assert int(state.step) == 2
