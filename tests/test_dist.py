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
