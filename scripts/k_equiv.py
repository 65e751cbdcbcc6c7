"""Tile-capacity equivalence check + step timing at the bench config.

138/256 tiles of the bench scene overflow even K=1024 (max wanted
count 4783) — but tiles saturate (T < 1e-4) long before capacity, so
overflow drops may be output-invisible. This measures render PSNR and
gradient deltas of K=512 / K=1024 against the lossless K=4864, and the
fused step time at each K, to decide the bench capacity on evidence.

Run: bash scripts/tpu_run.sh scripts/k_equiv.py
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
    import numpy as np
    import optax

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.losses import photometric_loss, psnr
    from robosimgs_tpu.train.optim import float_params, make_optimizer

    N, RES = 100_000, 256
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0, RES, RES)
    g = Gaussians.random(jax.random.PRNGKey(0), N, sh_degree=3, extent=1.5)
    target = jnp.zeros((RES, RES, 3))
    params0 = float_params(g)

    def cfg_k(k, chunk=0):
        return RenderConfig(tile_capacity=k, max_tiles_per_gaussian=12,
                            tile_chunk=chunk)

    import os as _os
    ks = [tuple(int(v) for v in x.split(":")) for x in _os.environ.get(
        "KEQ_KS", "5120:512,1024:0,512:0,768:0").split(",")]
    outs, grads = {}, {}
    for k, chunk in ks:
        _pet()
        cfg = cfg_k(k, chunk)

        def loss_fn(p):
            out = composite_tiled(project(g.replace(**p), cam, cfg),
                                  RES, RES, cfg)
            return photometric_loss(out["rgb"], target), out["rgb"]

        (l, rgb), gr = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params0)
        jax.block_until_ready(gr)
        outs[k] = np.asarray(rgb)
        grads[k] = jax.tree_util.tree_map(np.asarray, gr)
        print(f"K={k}: loss={float(l):.6f}", flush=True)
        _pet()

    k_ref = ks[0][0]
    ref = outs[k_ref]
    for k, _ in ks[1:]:
        p = float(psnr(jnp.asarray(outs[k]), jnp.asarray(ref)))
        gd = max(float(np.max(np.abs(grads[k][f] - grads[k_ref][f])))
                 for f in grads[k])
        gm = max(float(np.max(np.abs(grads[k_ref][f]))) for f in grads[k_ref])
        print(f"K={k} vs lossless: psnr={p:.1f} dB  max|grad diff|={gd:.3e} "
              f"(grad scale {gm:.3e})", flush=True)

    # fused step timing at each K (with the matmul SSIM)
    optimizer = make_optimizer()

    def make_step(cfg):
        def step(params, opt_state):
            def loss_fn(p):
                out = composite_tiled(project(g.replace(**p), cam, cfg),
                                      RES, RES, cfg)
                return photometric_loss(out["rgb"], target)
            loss, gr = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(gr, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return jax.jit(step, donate_argnums=(0, 1))

    for k, chunk in ks[1:]:
        _pet()
        stepf = make_step(cfg_k(k, chunk))
        cur = (jax.tree_util.tree_map(jnp.copy, params0),
               optimizer.init(params0))
        o = stepf(*cur)
        jax.block_until_ready(o)
        _pet()
        cur = o[:2]
        t0 = time.time()
        for _ in range(30):
            o = stepf(*cur)
            cur = o[:2]
        jax.block_until_ready(o)
        ms = (time.time() - t0) / 30 * 1000
        print(f"K={k}: fused step {ms:.2f} ms "
              f"({N / (ms / 1000) / 1e6:.2f}M gaussians/s)", flush=True)

    _done["ok"] = True


if __name__ == "__main__":
    main()
