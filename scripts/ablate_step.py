"""Ablation timing of the FUSED train step on real TPU.

The standalone-stage profile (scripts/profile_stages.py) can't see
XLA's overlap; this measures the fused step with components removed,
so each delta is the true marginal cost inside the compiled graph.

Run: bash scripts/tpu_run.sh scripts/ablate_step.py
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
    # inactivity watchdog: each variant pets it, so six sequential
    # compiles don't trip it — only a genuinely wedged compile does
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

    t0 = time.time()
    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"probe {time.time()-t0:.1f}s backend={jax.default_backend()}",
          flush=True)

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.losses import photometric_loss
    from robosimgs_tpu.train.optim import float_params, make_optimizer

    N, RES = 100_000, 256
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0, RES, RES)
    g = Gaussians.random(jax.random.PRNGKey(0), N, sh_degree=3, extent=1.5)
    target = jnp.zeros((RES, RES, 3))
    optimizer = make_optimizer()
    params0 = float_params(g)
    opt_state0 = optimizer.init(params0)

    def timeit(fn, args, iters=30, donate=()):
        jfn = jax.jit(fn, donate_argnums=donate)
        out = jfn(*args)
        jax.block_until_ready(out)
        # refresh donated buffers each call is impossible in a timing
        # loop; for donated variants we thread (params, opt) through
        if donate:
            # args were donated by the warmup call — continue from its
            # outputs (the step returns its donated inputs first)
            t0 = time.time()
            cur = out[:len(args)]
            for _ in range(iters):
                o = jfn(*cur)
                cur = o[:len(args)]
            jax.block_until_ready(o)
            return (time.time() - t0) / iters * 1000.0
        t0 = time.time()
        for _ in range(iters):
            out = jfn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters * 1000.0

    def fresh():
        return (jax.tree_util.tree_map(jnp.copy, params0),
                jax.tree_util.tree_map(jnp.copy, opt_state0))

    def make_step(cfg, ssim=True, adam=True, loss_kind="photo"):
        def step(params, opt_state):
            def loss_fn(p):
                gg = g.replace(**p)
                out = composite_tiled(project(gg, cam, cfg), RES, RES, cfg)
                if loss_kind == "photo":
                    l = photometric_loss(out["rgb"], target,
                                         0.2 if ssim else 0.0)
                elif loss_kind == "l1":
                    l = jnp.mean(jnp.abs(out["rgb"] - target))
                else:  # "sum" — cheapest possible cotangent seed
                    l = jnp.sum(out["rgb"])
                return l

            loss, grads = jax.value_and_grad(loss_fn)(params)
            if adam:
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss
            gs = sum(jnp.sum(v * v) for v in grads.values())
            return params, opt_state, loss + gs

        return step

    cfg0 = RenderConfig(tile_capacity=1024, max_tiles_per_gaussian=12)

    variants = [
        ("full step (K=1024, M=12, SSIM, Adam)", make_step(cfg0), True),
        ("no Adam (grads only)", make_step(cfg0, adam=False), False),
        ("L1-only loss", make_step(cfg0, ssim=False, loss_kind="l1"), True),
        ("sum-loss (raw bwd cost)", make_step(cfg0, loss_kind="sum"), True),
        ("K=512", make_step(RenderConfig(tile_capacity=512,
                                         max_tiles_per_gaussian=12)), True),
        ("M=8", make_step(RenderConfig(tile_capacity=1024,
                                       max_tiles_per_gaussian=8)), True),
    ]
    for name, step, donate in variants:
        _pet()
        ms = timeit(step, fresh(), donate=(0, 1) if donate else ())
        print(f"{ms:7.2f} ms  {name}", flush=True)
        _pet()

    # fwd-only for reference
    def fwd(params):
        return composite_tiled(project(g.replace(**params), cam, cfg0),
                               RES, RES, cfg0)["rgb"]
    ms = timeit(fwd, (params0,))
    print(f"{ms:7.2f} ms  fwd-only render", flush=True)

    _done["ok"] = True


if __name__ == "__main__":
    main()
