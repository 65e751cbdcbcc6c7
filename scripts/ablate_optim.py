"""Is the optimizer really ~4.5 ms of the 10.5 ms step? Time the full
step with: optax.multi_transform (current), a single optax.adam, a
hand-rolled flat per-group Adam, and no optimizer — each twice, to
separate real cost from tunnel timing variance.

Run: bash scripts/tpu_run.sh scripts/ablate_optim.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_done = {"ok": False, "last": time.time()}


def _pet():
    _done["last"] = time.time()


def _watchdog():
    while not _done["ok"]:
        time.sleep(30)
        if time.time() - _done["last"] > 420:
            print("WATCHDOG: compile wedged — rerun this script", flush=True)
            os._exit(17)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp
    import optax

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.losses import photometric_loss
    from robosimgs_tpu.train.optim import (OptimConfig, _means_schedule,
                                           float_params, make_optimizer)

    N, RES = 100_000, 256
    cfg = RenderConfig(tile_capacity=512, max_tiles_per_gaussian=12)
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0, RES, RES)
    g = Gaussians.random(jax.random.PRNGKey(0), N, sh_degree=3, extent=1.5)
    target = jnp.zeros((RES, RES, 3))
    ocfg = OptimConfig()
    params0 = float_params(g)

    def loss_fn(p):
        gg = g.replace(**p)
        out = composite_tiled(project(gg, cam, cfg), RES, RES, cfg)
        return photometric_loss(out["rgb"], target, 0.2)

    def timeit_step(step, state0, iters=40):
        jfn = jax.jit(step, donate_argnums=(0,))
        cur = jax.tree_util.tree_map(jnp.copy, state0)
        out = jfn(cur)
        jax.block_until_ready(out)
        cur = out[0]
        t0 = time.time()
        for _ in range(iters):
            out = jfn(cur)
            cur = out[0]
        jax.block_until_ready(out)
        return (time.time() - t0) / iters * 1000.0

    # 1) current multi_transform
    mt = make_optimizer(ocfg, 1.0)
    def step_mt(state):
        params, opt_state = state
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = mt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss
    s0_mt = (params0, mt.init(params0))

    # 2) single plain adam
    ad = optax.adam(1e-3, b1=ocfg.b1, b2=ocfg.b2, eps=ocfg.eps)
    def step_ad(state):
        params, opt_state = state
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = ad.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss
    s0_ad = (params0, ad.init(params0))

    # 3) hand-rolled flat per-group adam
    sched = _means_schedule(ocfg, 1.0)
    lrs = {"means": None, "quats": ocfg.quat_lr,
           "log_scales": ocfg.scale_lr,
           "logit_opacities": ocfg.opacity_lr,
           "sh_dc": ocfg.sh_dc_lr, "sh_rest": ocfg.sh_rest_lr}
    def step_flat(state):
        params, m, v, count = state
        loss, grads = jax.value_and_grad(loss_fn)(params)
        count = count + 1
        bc1 = 1.0 - ocfg.b1 ** count
        bc2 = 1.0 - ocfg.b2 ** count
        new_p, new_m, new_v = {}, {}, {}
        for k in params:
            lr = sched(count) if lrs[k] is None else lrs[k]
            gk = grads[k]
            new_m[k] = ocfg.b1 * m[k] + (1 - ocfg.b1) * gk
            new_v[k] = ocfg.b2 * v[k] + (1 - ocfg.b2) * gk * gk
            new_p[k] = params[k] - lr * (new_m[k] / bc1) / (
                jnp.sqrt(new_v[k] / bc2) + ocfg.eps)
        return (new_p, new_m, new_v, count), loss
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params0)
    s0_flat = (params0, zeros,
               jax.tree_util.tree_map(jnp.zeros_like, params0),
               jnp.zeros((), jnp.float32))

    # 4) grads only
    def step_none(state):
        params, = state
        loss, grads = jax.value_and_grad(loss_fn)(params)
        gs = sum(jnp.sum(v * v) for v in grads.values())
        return (params,), loss + gs
    s0_none = (params0,)

    for name, step, s0 in [("multi_transform", step_mt, s0_mt),
                           ("plain adam", step_ad, s0_ad),
                           ("flat adam", step_flat, s0_flat),
                           ("no optimizer", step_none, s0_none)]:
        _pet()
        t1 = timeit_step(step, s0)
        _pet()
        t2 = timeit_step(step, s0)
        print(f"  {name:16s} {t1:7.2f} / {t2:7.2f} ms", flush=True)
    _done["ok"] = True


if __name__ == "__main__":
    main()
