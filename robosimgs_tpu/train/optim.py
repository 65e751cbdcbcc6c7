"""Per-parameter-group Adam for Gaussian splats.

The standard 3DGS learning-rate schedule (the semantics of the
splatfacto optimizer the reference delegates to, SURVEY.md §3.4):
means get an exponentially decaying lr scaled by the scene extent;
each other field gets its own constant lr; Adam with eps=1e-15.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from robosimgs_tpu.core.types import Gaussians


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    means_lr_init: float = 1.6e-4      # x scene_extent
    means_lr_final: float = 1.6e-6     # x scene_extent
    means_lr_max_steps: int = 30_000
    sh_dc_lr: float = 2.5e-3
    sh_rest_lr: float = 2.5e-3 / 20.0
    opacity_lr: float = 0.05
    scale_lr: float = 5.0e-3
    quat_lr: float = 1.0e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-15


def _means_schedule(cfg: OptimConfig, scene_extent: float):
    init = cfg.means_lr_init * scene_extent
    final = cfg.means_lr_final * scene_extent

    def sched(step):
        t = jnp.clip(step / cfg.means_lr_max_steps, 0.0, 1.0)
        return jnp.exp((1 - t) * jnp.log(init) + t * jnp.log(final))

    return sched


FLOAT_FIELDS = ("means", "quats", "log_scales", "logit_opacities", "sh_dc", "sh_rest")


def float_params(g: Gaussians) -> dict:
    """The trainable (float) fields of a Gaussians pytree as a dict —
    the parameter structure the optimizer operates on (`alive` is a
    liveness mask, not a parameter)."""
    return {k: getattr(g, k) for k in FLOAT_FIELDS}


def make_optimizer(cfg: OptimConfig = OptimConfig(), scene_extent: float = 1.0,
                   exposure_lr: float | None = None,
                   bilagrid_lr: float | None = None):
    """Returns an optax GradientTransformation over float_params dicts.

    exposure_lr / bilagrid_lr: when set, the param dict additionally
    carries an "exposure" (per-frame color affines) / "bilagrid"
    (per-frame bilateral grids) entry (trainer.py), each optimized with
    its own Adam group."""
    def adam(lr):
        return optax.adam(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)

    transforms = {
        "means": adam(_means_schedule(cfg, scene_extent)),
        "quats": adam(cfg.quat_lr),
        "log_scales": adam(cfg.scale_lr),
        "logit_opacities": adam(cfg.opacity_lr),
        "sh_dc": adam(cfg.sh_dc_lr),
        "sh_rest": adam(cfg.sh_rest_lr),
    }
    labels = {k: k for k in FLOAT_FIELDS}
    if exposure_lr is not None:
        transforms["exposure"] = adam(exposure_lr)
        labels["exposure"] = "exposure"
    if bilagrid_lr is not None:
        transforms["bilagrid"] = adam(bilagrid_lr)
        labels["bilagrid"] = "bilagrid"
    return optax.multi_transform(transforms, labels)


def reset_slots_in_opt_state(opt_state, spawn_mask: jax.Array):
    """Zero Adam moments for re-spawned capacity slots.

    spawn_mask: (N,) bool — slots whose parameters were overwritten by
    densification; their stale first/second moments must not leak into
    the new Gaussian's updates.
    """
    def reset(x):
        if isinstance(x, jax.Array) and x.ndim >= 1 and x.shape[0] == spawn_mask.shape[0]:
            mask = spawn_mask.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(mask, jnp.zeros_like(x), x)
        return x

    def is_moment_leaf(x):
        return isinstance(x, jax.Array)

    return jax.tree_util.tree_map(
        lambda x: reset(x) if is_moment_leaf(x) else x, opt_state)
