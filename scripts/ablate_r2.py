"""Fused-graph ablation at the BENCH config (K=512, M=12, 100k/256²).

Inlines the pipeline (project -> bin_and_gather_packed -> Pallas
composite -> loss -> Adam) with surgical stop_gradients so each
variant's delta vs the full step is the true in-graph marginal cost of
one backward component (the standalone profile is floor-dominated by
~1.1 ms/call dispatch).

Run: bash scripts/tpu_run.sh scripts/ablate_r2.py
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

    t0 = time.time()
    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"probe {time.time()-t0:.1f}s backend={jax.default_backend()}",
          flush=True)

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.binning import bin_and_gather_packed, pack16
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.losses import photometric_loss
    from robosimgs_tpu.train.optim import float_params, make_optimizer

    N, RES = 100_000, 256
    cfg = RenderConfig(tile_capacity=512, max_tiles_per_gaussian=12)
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0, RES, RES)
    g = Gaussians.random(jax.random.PRNGKey(0), N, sh_degree=3, extent=1.5)
    target = jnp.zeros((RES, RES, 3))
    optimizer = make_optimizer()
    params0 = float_params(g)
    opt_state0 = optimizer.init(params0)

    def timeit_donated(fn, iters=40):
        jfn = jax.jit(fn, donate_argnums=(0, 1))
        cur = (jax.tree_util.tree_map(jnp.copy, params0),
               jax.tree_util.tree_map(jnp.copy, opt_state0))
        out = jfn(*cur)
        jax.block_until_ready(out)
        cur = out[:2]
        t0 = time.time()
        for _ in range(iters):
            out = jfn(*cur)
            cur = out[:2]
        jax.block_until_ready(out)
        return (time.time() - t0) / iters * 1000.0

    def make_step(mode="full", ssim=True, adam=True):
        def step(params, opt_state):
            def loss_fn(p):
                gg = g.replace(**p)
                proj = project(gg, cam, cfg)
                out = composite_tiled(proj, RES, RES, cfg)
                l = photometric_loss(out["rgb"], target,
                                     0.2 if ssim else 0.0)
                return l

            def loss_fn_sg(p, sg_what):
                # inline pipeline with a surgical stop_gradient; add a
                # tiny direct probe on the sg'd tensor so upstream bwd
                # stays live (not DCE'd)
                gg = g.replace(**p)
                proj = project(gg, cam, cfg)
                packed = pack16(proj)
                geom, feat, counts, stats = bin_and_gather_packed(
                    proj, RES, RES, cfg)
                if sg_what == "gather":
                    # kill the (T,K,16)->(N,16) scatter transpose only
                    geom = jax.lax.stop_gradient(geom)
                    feat = jax.lax.stop_gradient(feat)
                probe = 1e-12 * jnp.sum(packed)
                from robosimgs_tpu.render.tiled import composite_from_tiles
                out = composite_from_tiles(geom, feat,
                                           jax.lax.stop_gradient(counts),
                                           RES, RES, cfg)
                l = photometric_loss(out["rgb"], target, 0.2)
                return l + probe

            if mode == "full":
                f = loss_fn
            elif mode == "sg_gather":
                f = lambda p: loss_fn_sg(p, "gather")
            loss, grads = jax.value_and_grad(f)(params)
            if adam:
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    variants = [
        ("full step", make_step("full")),
        ("sg feature-gather (no bwd scatter)", make_step("sg_gather")),
        ("no SSIM (L1 only)", make_step("full", ssim=False)),
        ("no Adam", make_step("full", adam=False)),
    ]

    for name, step in variants:
        _pet()
        ms = timeit_donated(step)
        print(f"{ms:7.2f} ms  {name}", flush=True)
        _pet()

    def fwd(params):
        return composite_tiled(project(g.replace(**params), cam, cfg),
                               RES, RES, cfg)["rgb"]
    jf = jax.jit(fwd)
    r = jf(params0); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(40):
        r = jf(params0)
    jax.block_until_ready(r)
    print(f"{(time.time()-t0)/40*1000:7.2f} ms  fwd-only render", flush=True)
    _done["ok"] = True


if __name__ == "__main__":
    main()
