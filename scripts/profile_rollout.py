"""Rollout-path roofline: decompose the 4-cam 640x480 @200k frame.

VERDICT r4 item 3: the rollout frame (113.96 ms, 8.8 fps) is the
throughput of pipeline stage 4 and has never been decomposed. This
profiles, on the live chip:

  * per-camera stages: project / fused bin+gather / Pallas fwd /
    1-camera composite e2e
  * 4-camera strategies: 4 sequential 1-cam dispatches (the r3 wedge
    workaround) vs composite_tiled_batch (vmap-binned, ONE Pallas grid
    of 4T tiles — the compile-sane fused path)
  * config variants: the r4 single-tier M=12/K=1024 default vs the
    measured two-tier config, and the K=512 capacity (gated by render
    PSNR vs a lossless-capacity render, the bench convention)

Run: bash scripts/tpu_run.sh scripts/profile_rollout.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from wedgeguard import start_wedge_guard  # noqa: E402

_pet = start_wedge_guard()

W, H = 640, 480
ITERS = int(os.environ.get("RSGS_PROF_ITERS", "20"))


def timeit(f, *args, iters=ITERS):
    import jax
    r = f(*args)
    jax.block_until_ready(r)
    _pet()
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    _pet()
    return (time.time() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)
    _pet()

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.binning import bin_and_gather_packed
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.pallas_kernels import composite_fwd_pallas
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import (composite_tiled,
                                            composite_tiled_batch)
    from robosimgs_tpu.render.tiles import num_tiles
    from robosimgs_tpu.train.losses import psnr

    attempt = 16 * max(int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0) - 1, 0)
    n = 200_000 + attempt
    g = Gaussians.random(jax.random.PRNGKey(2), n, sh_degree=2, extent=1.5)
    cams = [Camera.look_at([3.0 + 0.1 * i, 0.4, 1.0], [0, 0, 0], [0, 0, 1],
                           60.0, W, H) for i in range(4)]
    tiles_x, tiles_y = num_tiles(W, H, 16)
    T = tiles_x * tiles_y

    # r4 default config vs measured variants (scene stats from the CPU
    # cover measurement — see docs/ROOFLINE.md rollout section)
    def mkcfg(k, m=12, bbox=0, split=0, frac=0.0, chunk=None):
        if chunk is None:  # tile_chunk must divide K
            chunk = 512 if k % 512 == 0 else 0
        return RenderConfig(tile_capacity=k, tile_chunk=chunk,
                            max_tiles_per_gaussian=m,
                            bbox_tiles_per_gaussian=bbox,
                            two_tier_split=split, two_tier_spill_frac=frac)

    cfg_r4 = mkcfg(1024)
    variants = {"r4_single_K1024": cfg_r4}
    for spec in os.environ.get("RSGS_ROLLOUT_VARIANTS", "").split(";"):
        if not spec:
            continue
        name, *kv = spec.split(",")
        kw = dict(x.split("=") for x in kv)
        variants[name] = mkcfg(int(kw.get("k", 1024)),
                               m=int(kw.get("m", 12)),
                               bbox=int(kw.get("bbox", 0)),
                               split=int(kw.get("split", 0)),
                               frac=float(kw.get("frac", 0.0)))

    results = {"n": n, "T": T, "iters": ITERS}

    # --- stage decomposition at the r4 config, camera 0 ---
    cam = cams[0]
    projf = jax.jit(lambda m: project(g.replace(means=m), cam, cfg_r4))
    proj = projf(g.means)
    jax.block_until_ready(proj.means2d)
    _pet()
    results["project_ms"] = round(timeit(projf, g.means), 2)

    binf = jax.jit(lambda m: bin_and_gather_packed(
        project(g.replace(means=m), cam, cfg_r4), W, H, cfg_r4)[:3])
    results["project_bin_ms"] = round(timeit(binf, g.means), 2)

    geom, feat, counts, stats = jax.jit(lambda: bin_and_gather_packed(
        project(g, cam, cfg_r4), W, H, cfg_r4))()
    jax.block_until_ready(geom)
    _pet()
    print(f"cam0 stats: max_count={int(stats.max_tile_count)} "
          f"trunc={int(stats.truncated_gaussians)} "
          f"overflow={int(stats.overflowed_tiles)} "
          f"pairs={int(stats.total_pairs)}", flush=True)
    P = 256
    dlim = jnp.full((T, P, 1), jnp.inf, jnp.float32)
    kfwd = jax.jit(lambda ge, fe, c: composite_fwd_pallas(
        ge, fe, c, dlim, tiles_x=tiles_x, cfg=cfg_r4)[0])
    results["pallas_fwd_ms"] = round(timeit(kfwd, geom, feat, counts), 2)

    # --- full-frame strategies per variant ---
    for name, cfg in variants.items():
        one = jax.jit(lambda m, c=cams[0], cfg=cfg: composite_tiled(
            project(g.replace(means=m), c, cfg), W, H, cfg)["rgb"])
        t_one = timeit(one, g.means)

        # 4 sequential dispatches (separate compiled programs per cam)
        fns = [jax.jit(lambda m, c=c, cfg=cfg: composite_tiled(
            project(g.replace(means=m), c, cfg), W, H, cfg)["rgb"])
            for c in cams]
        for f in fns:
            jax.block_until_ready(f(g.means))
            _pet()
        t0 = time.time()
        for _ in range(ITERS):
            rs = [f(g.means) for f in fns]
        jax.block_until_ready(rs)
        t_seq = (time.time() - t0) / ITERS * 1000.0
        _pet()

        # batched: ONE program, ONE Pallas grid of 4T tiles
        from robosimgs_tpu.parallel.distributed import stack_cameras
        cam_stack = stack_cameras(cams)

        def batched(m, cfg=cfg):
            projs = jax.vmap(
                lambda c: project(g.replace(means=m), c, cfg))(cam_stack)
            return composite_tiled_batch(projs, W, H, cfg)["rgb"]
        bat = jax.jit(batched)
        t_bat = timeit(bat, g.means)

        results[name] = {"one_cam_ms": round(t_one, 2),
                         "seq4_ms": round(t_seq, 2),
                         "batched4_ms": round(t_bat, 2)}
        print(f"{name}: 1cam={t_one:.2f} seq4={t_seq:.2f} "
              f"batched4={t_bat:.2f} ms", flush=True)

    # --- K-equivalence gate on this scene (camera 0) ---
    if os.environ.get("RSGS_ROLLOUT_GATE", "1") == "1":
        # lossless reference must be M-lossless too (measured scene
        # maxima: bbox 81, survivor 61 — scripts cover measurement)
        k_loss = int(os.environ.get("RSGS_ROLLOUT_K_LOSSLESS", "8192"))
        ref_cfg = mkcfg(k_loss, m=64, bbox=84)
        ref = jax.jit(lambda: composite_tiled(
            project(g, cams[0], ref_cfg), W, H, ref_cfg)["rgb"])()
        jax.block_until_ready(ref)
        _pet()
        # candidates must be M-lossless too — gating a K candidate at
        # the truncating m=12 measures M-truncation error, not
        # K-overflow (measured: the r4 lossy config sits at 19.2 dB vs
        # lossless, i.e. its rendered image is visibly wrong)
        for k in (2048, 1024, 512):
            kc = mkcfg(k, m=64, bbox=84)
            r = jax.jit(lambda kc=kc: composite_tiled(
                project(g, cams[0], kc), W, H, kc)["rgb"])()
            p = float(psnr(r, ref))
            results[f"gate_K{k}_dB"] = round(p, 1)
            print(f"K={k} (m=64) vs K={k_loss}: {p:.1f} dB", flush=True)
            _pet()
        # the r4 lossy config's own distance to lossless, for the record
        r4r = jax.jit(lambda: composite_tiled(
            project(g, cams[0], cfg_r4), W, H, cfg_r4)["rgb"])()
        results["r4_lossy_dB"] = round(float(psnr(r4r, ref)), 1)
        print(f"r4 lossy (M=12,K=1024) vs lossless: "
              f"{results['r4_lossy_dB']} dB", flush=True)

    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
