"""Benchmark: 3DGS train-step throughput on the real TPU chip.

Workload = BASELINE.md staged config 1 scaled up: N Gaussians rendered
at RES x RES, full training iteration (project -> bin -> Pallas composite
fwd -> L1+SSIM -> Pallas bwd -> Adam). Headline value is Gaussians
rasterized per second per chip (alive Gaussians x train iters/sec) —
the BASELINE.json metric.

The reference (Maxwell-Zhao/RoboSimGS) publishes no benchmark numbers
(BASELINE.md), so vs_baseline is the ratio against the round-1 recorded
value of this same benchmark (BENCH_R1 below) — i.e. round 1 defines
the baseline at 1.0 and later rounds must beat it.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import threading
import time

import numpy as np

BENCH_R1 = 1_252_863.8  # round-1 recorded value (TPU v5e, 2026-08-17)

N_GAUSSIANS = 100_000
RES = 256
ITERS = int(os.environ.get("RSGS_BENCH_ITERS", "100"))

# axon wedge watchdog (CLAUDE.md): if a compile hangs >420s, exit 17 so
# scripts/tpu_run.sh can probe + retry; pass an N override (argv[1]) to
# perturb the program key past a poisoned compile-cache entry.
_last = {"t": time.time(), "done": False}


def _pet():
    _last["t"] = time.time()


_WATCHDOG_S = int(os.environ.get(
    "RSGS_WATCHDOG_S", os.environ.get("RSGS_WEDGE_S", "420")))


def _watchdog():
    while not _last["done"]:
        time.sleep(30)
        if time.time() - _last["t"] > _WATCHDOG_S:
            print("WATCHDOG: compile wedged — retry (perturb N)",
                  file=sys.stderr, flush=True)
            os._exit(17)


def main():
    global N_GAUSSIANS
    if len(sys.argv) > 1:
        N_GAUSSIANS = int(sys.argv[1])
    # program-key perturbation on retry (CLAUDE.md): fold the tpu_run.sh
    # attempt into the PRIMARY bench shapes too — a wedge in the main
    # step program otherwise resubmits the poisoned key on every retry
    N_GAUSSIANS += 16 * max(
        int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0) - 1, 0)
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.losses import photometric_loss
    from robosimgs_tpu.train.optim import float_params, make_optimizer

    err = sys.stderr
    print(f"backend={jax.default_backend()} devices={jax.devices()}", file=err)

    # Default = the survivor-compaction config: bbox enumeration at
    # BBOX=12 (lossless — the scene's measured max bbox tile cover),
    # exact-intersection cull, survivors compacted into M=10 sort slots
    # (post-cull max coverage is 9). Measured 2026-08-18 on v5e:
    # 9.86 ms/iter vs 11.86 for the plain M=12 path (sort shrinks
    # 1.2M -> 1.0M slots). Truncation is counted + asserted 0 below, and
    # K=512 is OUTPUT-EQUIVALENT to the lossless capacity on this scene
    # (120 dB vs K=5120, scripts/k_equiv.py: tiles saturate T<1e-4 long
    # before capacity) — gated below against a lossless render every
    # run, so the tuning can never silently degrade the workload.
    # RSGS_BENCH_M / RSGS_BENCH_BBOX override for variant measurement
    # (M=12 BBOX=0 reproduces the plain path).
    m_kept = int(os.environ.get("RSGS_BENCH_M", "10"))
    m_bbox = int(os.environ.get("RSGS_BENCH_BBOX", "12"))
    # RSGS_BENCH_ALPHA_MXU=1 measures the MXU alpha-eval variant
    # (render/pallas_kernels._alpha_block_mxu; parity-gated in tests)
    a_mxu = bool(int(os.environ.get("RSGS_BENCH_ALPHA_MXU", "0")))
    # two-tier sort slots (RSGS_BENCH_TT_SPLIT=0 disables): on this
    # scene 88.5% of gaussians cover <= 4 tiles post-cull, so tier 1 =
    # everyone's first 4 slots + tier 2 = the widest 15% spill shrinks
    # the key sort 1.0M -> ~0.5M slots (exactness parity-tested; any
    # spill drop would trip the trunc==0 assert below). DEFAULT since
    # r4: 3x2-rep steady-state A/B (ITERS=100) measured 8.57/8.59 vs
    # 9.00/9.05 ms train, 4.31 vs 4.84 ms fwd
    # K=384 default since r5: the saturation gate (below, every run)
    # measured 93.6 dB vs the lossless K=5120 render and the k_equiv
    # grad check 4.1e-6 max grad delta at 6.8e-3 grad scale (0.06%,
    # scripts/k_equiv.py KEQ_KS run 2026-08-21) — output-equivalent
    # while the (T, K) gather/kernel work shrinks 25%: 8.57 -> 7.18 ms
    # train, 4.33 -> 3.79 ms fwd. K=256 also passes the 60 dB bar
    # (68.9 dB, 6.08 ms, grad delta 0.45%) — kept as a measured point,
    # not the default (the gate margin thins as saturation weakens).
    tt_split = int(os.environ.get("RSGS_BENCH_TT_SPLIT", "4"))
    tt_frac = float(os.environ.get("RSGS_BENCH_TT_FRAC", "0.15"))
    k_bench = int(os.environ.get("RSGS_BENCH_K", "384"))
    cfg = RenderConfig(tile_capacity=k_bench, max_tiles_per_gaussian=m_kept,
                       bbox_tiles_per_gaussian=m_bbox, alpha_mxu=a_mxu,
                       two_tier_split=tt_split, two_tier_spill_frac=tt_frac)
    cfg_lossless = RenderConfig(tile_capacity=5120, tile_chunk=512,
                                max_tiles_per_gaussian=12)
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0, RES, RES)
    g = Gaussians.random(jax.random.PRNGKey(0), N_GAUSSIANS, sh_degree=3,
                         extent=1.5)
    target = jnp.zeros((RES, RES, 3))
    optimizer = make_optimizer()
    params = float_params(g)
    opt_state = optimizer.init(params)

    def step(params, opt_state):
        def loss_fn(p):
            gg = g.replace(**p)
            out = composite_tiled(project(gg, cam, cfg), RES, RES, cfg,
                                  return_stats=True)
            return photometric_loss(out["rgb"], target), out["stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, stats

    step = jax.jit(step, donate_argnums=(0, 1))

    # capacity-equivalence gate: the benched K must reproduce the
    # lossless render (>60 dB) on this exact scene
    def render(p, c):
        return composite_tiled(project(g.replace(**p), cam, c), RES, RES,
                               c)["rgb"]

    r_fast = jax.jit(lambda p: render(p, cfg))(params)
    _pet()
    r_full = jax.jit(lambda p: render(p, cfg_lossless))(params)
    _pet()
    mse = float(jnp.mean((r_fast - r_full) ** 2))
    eq_psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(f"K={cfg.tile_capacity} vs lossless render: {eq_psnr:.1f} dB",
          file=err)
    assert eq_psnr > 60.0, f"capacity tune not output-equivalent: {eq_psnr}"

    t0 = time.time()
    params, opt_state, loss, stats = step(params, opt_state)
    jax.block_until_ready(loss)
    _pet()
    print(f"compile+first: {time.time()-t0:.1f}s loss={float(loss):.5f}", file=err)
    trunc = int(stats.truncated_gaussians)
    assert trunc == 0, f"bench config truncates {trunc} gaussians"

    # warmup
    for _ in range(3):
        params, opt_state, loss, stats = step(params, opt_state)
    jax.block_until_ready(loss)

    t0 = time.time()
    for _ in range(ITERS):
        params, opt_state, loss, stats = step(params, opt_state)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / ITERS
    iters_per_sec = 1.0 / dt
    value = N_GAUSSIANS * iters_per_sec
    print(f"train step: {dt*1000:.2f} ms/iter ({iters_per_sec:.2f} it/s) "
          f"@ {N_GAUSSIANS} gaussians, {RES}x{RES}", file=err)

    # secondary diagnostic: forward-only render throughput
    fwd = jax.jit(lambda p: composite_tiled(
        project(g.replace(**p), cam, cfg), RES, RES, cfg)["rgb"])
    r = fwd(params)
    jax.block_until_ready(r)
    _pet()
    t0 = time.time()
    for _ in range(ITERS):
        r = fwd(params)
    jax.block_until_ready(r)
    fdt = (time.time() - t0) / ITERS
    print(f"fwd-only render: {fdt*1000:.2f} ms ({1/fdt:.1f} fps, "
          f"{N_GAUSSIANS/fdt/1e6:.2f}M gaussians/s)", file=err)

    # staged-config secondaries (BASELINE.md configs 3/4), env-gated so
    # the driver's default run stays fast; JSON lines go to STDERR (the
    # stdout contract is ONE line)
    if os.environ.get("RSGS_BENCH_STAGED"):
        _staged(err, _pet)

    _last["done"] = True
    vs = value / BENCH_R1 if BENCH_R1 else 1.0
    print(json.dumps({
        "metric": "gaussians_rasterized_per_sec_per_chip_fwd_bwd",
        "value": round(value, 1),
        "unit": "gaussians/s",
        "vs_baseline": round(vs, 4),
    }))


def _staged(err, pet):
    """Secondary staged configs: 1M-capacity train step @512^2 and the
    multi-camera 640x480 rollout frame rate (trend tracking; NEXT.md)."""
    import jax
    import jax.numpy as jnp

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.losses import photometric_loss
    from robosimgs_tpu.train.optim import float_params, make_optimizer

    # config 3: 1M Gaussians, 512x512 full train step.
    # Program-key perturbation: inherit the caller's N AND the retry
    # attempt (tpu_run.sh TPU_RUN_ATTEMPT) — without the latter, a retry
    # resubmits the exact poisoned program and wedges again (seen 3/3 on
    # the rollout-frame compile).
    attempt = 16 * int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
    res = 512
    n1m = 1_000_000 + (N_GAUSSIANS % 1000) + attempt
    # LOSSLESS staged config (round 5; scripts/staged_cover_stats.py +
    # scripts/staged_lossless.py): the r1-r4 K=1024/M=8 config silently
    # M-truncated 717k of the scene's 7.95M true pairs — M-truncation
    # drops NEAR tiles (image-corrupting), unlike K-overflow which
    # drops the FARTHEST entries saturated tiles never show. Measured
    # scene maxima: bbox cover 25, survivor cover 22, per-tile demand
    # 21626. So M=24/bbox=28 -> truncated_gaussians == 0 (asserted),
    # and K=512 is gated every run against the truly lossless K=22016
    # render, the primary bench's own convention (measured 87.3 dB).
    # Two-tier split=12 keeps every row with cover > 12 in the spill
    # tier (71680 rows measured; trunc==0 assert guards the coverage).
    # Timings 2026-08-20/21: single-tier K=1024 194.7 / K=512 134.1;
    # two-tier K=512 100.4 / K=384 91.25 ms vs the old LOSSY 159.66.
    # K gate history on this scene: 512 -> 87.3 dB, 384 -> 68.5 dB
    # (both > the 60 dB bar, asserted below every run), 256 -> 54.3 dB
    # (FAILS — 384 is the floor).
    tt_split = int(os.environ.get("RSGS_BENCH_STAGED_TT", "12"))
    tt_frac = float(os.environ.get("RSGS_BENCH_TT_FRAC", str(71680 / 1e6)))
    k_staged = int(os.environ.get("RSGS_BENCH_STAGED_K", "384"))
    cfg = RenderConfig(tile_capacity=k_staged,
                       tile_chunk=512 if k_staged % 512 == 0 else 0,
                       max_tiles_per_gaussian=24,
                       bbox_tiles_per_gaussian=28,
                       two_tier_split=tt_split, two_tier_spill_frac=tt_frac)
    cfg_lossless = RenderConfig(tile_capacity=22016, tile_chunk=512,
                                max_tiles_per_gaussian=24,
                                bbox_tiles_per_gaussian=28)
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0,
                         res, res)
    g = Gaussians.random(jax.random.PRNGKey(1), n1m, sh_degree=3,
                         extent=1.5)
    target = jnp.zeros((res, res, 3))
    optimizer = make_optimizer()
    params = float_params(g)
    opt_state = optimizer.init(params)

    # capacity-equivalence gate at the staged scale (mirrors bench.py's
    # primary gate): the staged K must reproduce the lossless render
    def s_render(c):
        return np.asarray(jax.jit(lambda p: composite_tiled(
            project(g.replace(**p), cam, c), res, res, c)["rgb"])(params))
    r_fast = s_render(cfg)
    pet()
    r_full = s_render(cfg_lossless)
    pet()
    mse = float(np.mean((r_fast - r_full) ** 2))
    s_psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(f"staged K={k_staged} vs lossless render: {s_psnr:.1f} dB",
          file=err)
    assert s_psnr > 60.0, f"staged capacity not output-equivalent: {s_psnr}"

    def step(params, opt_state):
        def loss_fn(p):
            out = composite_tiled(project(g.replace(**p), cam, cfg),
                                  res, res, cfg, return_stats=True)
            return photometric_loss(out["rgb"], target), out["stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state, loss, stats

    step = jax.jit(step, donate_argnums=(0, 1))
    params, opt_state, loss, stats = step(params, opt_state)
    jax.block_until_ready(loss)
    pet()
    print(f"1M staged stats: trunc={int(stats.truncated_gaussians)} "
          f"overflow_tiles={int(stats.overflowed_tiles)} "
          f"max_tile_count={int(stats.max_tile_count)}", file=err)
    # the staged number is HONEST since r5: zero M-truncation asserted
    # (K-overflow is covered by the equivalence gate above)
    assert int(stats.truncated_gaussians) == 0, (
        f"staged config truncates {int(stats.truncated_gaussians)}")
    t0 = time.time()
    for _ in range(10):
        params, opt_state, loss, stats = step(params, opt_state)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / 10
    print(json.dumps({"metric": "train_step_ms_1M_512", "value":
                      round(dt * 1000, 2), "unit": "ms"}), file=err)
    del params, opt_state, g

    # config 4: 4-camera 640x480 rollout render @200k.
    # HONEST since r5 (scripts/profile_rollout.py): the r1-r4 config
    # (M=12, K=1024) M-truncated 104,584 of 200k gaussians per camera —
    # its rendered frame sits at 19.2 dB vs the lossless render. The
    # scene's measured maxima are bbox cover 81 / survivor cover 61, so
    # M=64/bbox=84 -> truncated_gaussians == 0 (asserted below), two-
    # tier split=12 keeps every row with cover > 12 in the spill tier,
    # and K=512 is gated 120.0 dB vs the saturated K=8192 render.
    # Measured 2026-08-20: honest 109.48 ms vs lossy 113.60.
    n200 = 200_000 + (N_GAUSSIANS % 1000) + attempt
    g2 = Gaussians.random(jax.random.PRNGKey(2), n200, sh_degree=2,
                          extent=1.5)
    cams = [Camera.look_at([3.0 + 0.1 * i, 0.4, 1.0], [0, 0, 0],
                           [0, 0, 1], 60.0, 640, 480) for i in range(4)]
    rcfg = RenderConfig(tile_capacity=512, tile_chunk=512,
                        max_tiles_per_gaussian=64,
                        bbox_tiles_per_gaussian=84,
                        two_tier_split=12, two_tier_spill_frac=0.44864)

    from robosimgs_tpu.render.binning import bin_and_gather_packed
    for i, c in enumerate(cams):
        *_, st = jax.jit(lambda: bin_and_gather_packed(
            project(g2, c, rcfg), 640, 480, rcfg))()
        tg = int(st.truncated_gaussians)
        print(f"rollout staged cam{i}: trunc={tg} overflow="
              f"{int(st.overflowed_tiles)}", file=err)
        assert tg == 0, f"rollout cam{i} truncates {tg} gaussians"
        pet()

    def frame(p):
        return [composite_tiled(project(g2.replace(means=p), c, rcfg),
                                640, 480, rcfg)["rgb"] for c in cams]

    frame = jax.jit(frame)
    r = frame(g2.means)
    jax.block_until_ready(r)
    pet()
    t0 = time.time()
    for _ in range(10):
        r = frame(g2.means)
    jax.block_until_ready(r)
    fdt = (time.time() - t0) / 10
    print(json.dumps({"metric": "rollout_frame_ms_4cam_640x480_200k",
                      "value": round(fdt * 1000, 2), "unit": "ms"}),
          file=err)


if __name__ == "__main__":
    main()
