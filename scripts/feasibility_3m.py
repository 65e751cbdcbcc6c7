"""3M-gaussian single-chip feasibility (VERDICT r4 item 2a).

BASELINE staged config 5 is 3M gaussians sharded over 2 chips; its
per-chip half at full replication is 3M on ONE v5e — never demonstrated
before round 5. This runs, on the live chip at 512^2 (32px tiles, see
TILE below):

  * a fwd render with the capacity-doubling gate: K=2048 vs K=4096 must
    match > 60 dB (saturated tiles never show deeper entries, so
    K-doubling invariance certifies output-equivalence to the lossless
    capacity — the full 65k-capacity lossless render would need a ~4.3
    GB gather buffer, pointless for a gate the doubling test covers;
    cross-checked at 1M where the direct lossless gate measured 87.3 dB
    for K=512, scripts/staged_lossless.py)
  * 10 full train steps (project -> bin -> Pallas fwd/bwd -> Adam),
    truncated_gaussians == 0 asserted (32px tiles: M=16/bbox=20 covers
    the ts16-measured survivor max of 22 with ~4x tile-area margin)
  * device memory stats (HBM in use) after the step, if the runtime
    exposes them

Run: bash scripts/tpu_run.sh scripts/feasibility_3m.py
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
# tile_size=32: at n=3M the packed sort key needs 22 gid bits, so the
# 16px tiling's T=1024 (11 tile bits) overflows int32 and binning
# falls back to the two-array stable sort over 96M pairs — a program
# that reproducibly wedges the axon compile service (4 attempts,
# 2026-08-21, incl. a 1200 s window). T=256 keeps the packed path
# (9 + 22 = 31 bits); per-gaussian tile cover shrinks ~4x (M=16
# covers the measured ts16 survivor max of 22 with margin) and the
# per-tile demand grows ~4x (K gated by capacity doubling below).
TILE = 32
M_KEPT = 16
M_BBOX = 20


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

    attempt = 16 * max(int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0) - 1, 0)
    n = int(os.environ.get("FEAS_N", 3_000_000)) + attempt
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0,
                         RES, RES)
    g = Gaussians.random(jax.random.PRNGKey(5), n, sh_degree=3, extent=1.5)
    target = jnp.zeros((RES, RES, 3))
    params = float_params(g)

    def cfg_k(k, split=0, frac=0.0):
        return RenderConfig(tile_size=TILE, tile_capacity=k, tile_chunk=512,
                            max_tiles_per_gaussian=M_KEPT,
                            bbox_tiles_per_gaussian=M_BBOX,
                            two_tier_split=split, two_tier_spill_frac=frac)

    # --- K-doubling gate ---
    outs = {}
    for k in (4096, 2048):
        t0 = time.time()
        rgb, stats = jax.jit(lambda cfg=cfg_k(k): (
            lambda o: (o["rgb"], o["stats"]))(composite_tiled(
                project(g, cam, cfg), RES, RES, cfg, return_stats=True)))()
        jax.block_until_ready(rgb)
        _pet()
        tg = int(stats.truncated_gaussians)
        print(f"K={k}: compile+run {time.time()-t0:.1f}s trunc={tg} "
              f"max_tile_count={int(stats.max_tile_count)} "
              f"total_pairs={int(stats.total_pairs)}", flush=True)
        assert tg == 0, f"K={k} truncates {tg} gaussians"
        outs[k] = np.asarray(rgb)
    gate = float(psnr(jnp.asarray(outs[2048]), jnp.asarray(outs[4096])))
    print(f"K=2048 vs K=4096 (doubling gate): {gate:.1f} dB", flush=True)
    assert gate > 60.0, f"capacity not saturated at K=2048: {gate}"

    # --- timed train steps (single-tier at ts32: the spill coverage
    # was measured for 16px tiles; trunc==0 is asserted regardless) ---
    cfg = cfg_k(int(os.environ.get("FEAS_K", 2048)))
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)

    def step(params, opt_state):
        def loss_fn(p):
            out = composite_tiled(project(g.replace(**p), cam, cfg),
                                  RES, RES, cfg, return_stats=True)
            return photometric_loss(out["rgb"], target), out["stats"]
        (loss, stats), gr = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(gr, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, stats

    stepf = jax.jit(step, donate_argnums=(0, 1))
    t0 = time.time()
    params, opt_state, loss, stats = stepf(params, opt_state)
    jax.block_until_ready(loss)
    _pet()
    tg = int(stats.truncated_gaussians)
    print(f"train compile+first {time.time()-t0:.1f}s loss={float(loss):.4f} "
          f"trunc={tg}", flush=True)
    assert tg == 0, f"train config truncates {tg}"
    for _ in range(2):
        params, opt_state, loss, stats = stepf(params, opt_state)
    jax.block_until_ready(loss)
    iters = int(os.environ.get("FEAS_ITERS", "10"))
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss, stats = stepf(params, opt_state)
    jax.block_until_ready(loss)
    ms = (time.time() - t0) / iters * 1000
    print(f"3M train step: {ms:.2f} ms ({n / (ms / 1000) / 1e6:.1f}M "
          f"gaussians/s fwd+bwd)", flush=True)

    mem = {}
    try:
        st = jax.devices()[0].memory_stats()
        if st:
            mem = {k: int(v) for k, v in st.items()
                   if "bytes_in_use" in k or "peak" in k or "limit" in k}
            print(f"device memory: { {k: round(v/2**30, 2) for k, v in mem.items()} } GiB",
                  flush=True)
    except Exception as e:  # axon runtime may not expose stats
        print(f"memory_stats unavailable: {e}", flush=True)

    print("RESULT " + json.dumps({
        "n": n, "res": RES, "gate_db": round(gate, 1),
        "train_step_ms": round(ms, 2),
        "gaussians_per_sec": round(n / (ms / 1000), 1),
        "m_kept": M_KEPT, "m_bbox": M_BBOX,
        "k": cfg.tile_capacity, "memory": mem}), flush=True)


if __name__ == "__main__":
    main()
