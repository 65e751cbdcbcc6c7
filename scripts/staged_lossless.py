"""Lossless 1M@512^2 staged config: K-equivalence gate + honest timing.

Round-5 item 1 (VERDICT.md): the r4 staged number (159.66 ms at
K=1024/M=8) truncated 717,568 of ~8M true pairs — M=8 silently drops
NEAR tiles of wide gaussians, which corrupts the image (unlike
K-overflow, which drops the FARTHEST entries that saturated tiles never
show). Measured scene stats (scripts/staged_cover_stats.py, CPU):

    max bbox cover 25, max survivor cover 22, true pairs 7.95M,
    max per-tile demand 21626;
    lossless two-tier options: split=10 rows=158080, split=12 rows=71680

So M=24 (bbox 28) gives truncated_gaussians == 0 by construction, and
tile_capacity is gated the same way the primary bench gates its K=512:
render PSNR vs the truly-lossless K=22016 capacity must exceed 60 dB
(saturated tiles never show the dropped far entries). This script
measures that gate for K in {1024, 2048} and times the full train step
at the lossless configs (single-tier + the two lossless two-tier
options).

Run: bash scripts/tpu_run.sh scripts/staged_lossless.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from wedgeguard import start_wedge_guard  # noqa: E402

_pet = start_wedge_guard()

RES = 512
M_KEPT = 24          # >= measured max survivor cover 22 -> trunc == 0
M_BBOX = 28          # >= measured max bbox cover 25
K_LOSSLESS = 22016   # >= measured max per-tile demand 21626 (43 x 512)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)
    _pet()

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.losses import photometric_loss, psnr
    from robosimgs_tpu.train.optim import float_params, make_optimizer

    # program-key perturbation on tpu_run.sh retries (CLAUDE.md): the
    # capacity bump (+128) keeps tile_chunk=512 dividing K only when K
    # is a multiple of 512 already — bump the gaussian count instead,
    # which perturbs EVERY program this job compiles
    attempt = 16 * max(int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0) - 1, 0)
    n = int(os.environ.get("STAGED_N", 1_000_000)) + attempt
    res = int(os.environ.get("STAGED_RES", RES))
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0,
                         res, res)
    g = Gaussians.random(jax.random.PRNGKey(1), n, sh_degree=3, extent=1.5)
    target = jnp.zeros((res, res, 3))
    params0 = float_params(g)

    def cfg_k(k, split=0, frac=0.0):
        # tile_chunk must divide K; non-512-multiples run single-chunk
        # (VMEM per tile = 16*K*4 B, trivially small at K<=512)
        return RenderConfig(tile_capacity=k,
                            tile_chunk=512 if k % 512 == 0 else 0,
                            max_tiles_per_gaussian=M_KEPT,
                            bbox_tiles_per_gaussian=M_BBOX,
                            two_tier_split=split, two_tier_spill_frac=frac)

    def render(cfg):
        def f(p):
            out = composite_tiled(project(g.replace(**p), cam, cfg),
                                  res, res, cfg, return_stats=True)
            return out["rgb"], out["stats"]
        return jax.jit(f)

    # --- K-equivalence gate (the primary bench's own convention) ---
    k_lossless = int(os.environ.get("STAGED_K_LOSSLESS", K_LOSSLESS))
    k_cands = [int(x) for x in os.environ.get(
        "STAGED_K_CANDS", "2048,1024").split(",")]
    outs = {}
    for k in [k_lossless] + k_cands:
        t0 = time.time()
        rgb, stats = render(cfg_k(k))(params0)
        jax.block_until_ready(rgb)
        _pet()
        tg = int(stats.truncated_gaussians)
        assert tg == 0, f"K={k}: truncated_gaussians={tg} (must be 0)"
        outs[k] = np.asarray(rgb)
        print(f"K={k}: render ok, compile+run {time.time()-t0:.1f}s, "
              f"max_tile_count={int(stats.max_tile_count)} "
              f"overflow_tiles={int(stats.overflowed_tiles)} "
              f"total_pairs={int(stats.total_pairs)}", flush=True)
    gate = {}
    for k in k_cands:
        p = float(psnr(jnp.asarray(outs[k]), jnp.asarray(outs[k_lossless])))
        gate[k] = p
        print(f"K={k} vs lossless K={k_lossless}: {p:.1f} dB", flush=True)

    # --- timing: full train step at the lossless configs ---
    optimizer = make_optimizer()

    def make_step(cfg):
        def step(params, opt_state):
            def loss_fn(p):
                out = composite_tiled(project(g.replace(**p), cam, cfg),
                                      res, res, cfg, return_stats=True)
                return photometric_loss(out["rgb"], target), out["stats"]
            (loss, stats), gr = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(gr, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, loss,
                    stats)
        return jax.jit(step, donate_argnums=(0, 1))

    results = {"gate_psnr": gate, "n": n, "res": res,
               "m_kept": M_KEPT, "m_bbox": M_BBOX}
    variants = [
        ("single", 0, 0.0),
        ("tt10", 10, 158080 / 1_000_000),
        ("tt12", 12, 71680 / 1_000_000),
    ]
    k_timed = int(os.environ.get("STAGED_K", "1024"))
    iters = int(os.environ.get("STAGED_ITERS", "10"))
    for name, split, frac in variants:
        stepf = make_step(cfg_k(k_timed, split, frac))
        cur = (jax.tree_util.tree_map(jnp.copy, params0),
               optimizer.init(params0))
        t0 = time.time()
        o = stepf(*cur)
        jax.block_until_ready(o[2])
        _pet()
        tg = int(o[3].truncated_gaussians)
        print(f"{name}: compile+first {time.time()-t0:.1f}s "
              f"trunc={tg} total_pairs={int(o[3].total_pairs)}", flush=True)
        assert tg == 0, f"{name}: truncated_gaussians={tg} (must be 0)"
        cur = o[:2]
        for _ in range(2):
            o = stepf(*cur)
            cur = o[:2]
        jax.block_until_ready(o[2])
        t0 = time.time()
        for _ in range(iters):
            o = stepf(*cur)
            cur = o[:2]
        jax.block_until_ready(o[2])
        ms = (time.time() - t0) / iters * 1000
        results[name] = round(ms, 2)
        print(f"{name} (K={k_timed}, split={split}): {ms:.2f} ms/step",
              flush=True)
        _pet()

    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
