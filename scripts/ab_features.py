"""At-scale A/B convergence evidence for the quality features.

Trains the FLAGSHIP synthetic capture (train_synthetic_flagship.
build_scene: subdivided floor + per-face color noise, zero-truncation-
asserted mesh-raster targets — the r3 flagship bug made plain
synthetic_mesh_scene unsafe at 512^2) at 512x512 under seven arms —
baseline, absgrad densification, antialiased (mip-splatting) mode,
scale regularizer, bilateral grid, depth supervision, normal
regularizer — and reports held-out PSNR + alive counts per arm: the
"A/B re-run at that scale" evidence VERDICT r2 item 1 asks for.

Run: bash scripts/tpu_run.sh scripts/ab_features.py [out.json]
Envs: AB_RES (512), AB_ITERS (1500), AB_CAPACITY (100000),
      AB_VIEWS (24), AB_HOLDOUT (4), AB_ARMS (comma list filter).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from wedgeguard import start_wedge_guard  # noqa: E402

_pet = start_wedge_guard()   # no-op on JAX_PLATFORMS=cpu


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_features_r3.json"

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)

    from train_synthetic_flagship import build_scene

    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.train.densify import DensifyConfig
    from robosimgs_tpu.train.optim import OptimConfig
    from robosimgs_tpu.train.trainer import TrainConfig, Trainer

    res = int(os.environ.get("AB_RES", 512))
    iters = int(os.environ.get("AB_ITERS", 1500))
    att = 16 * int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
    capacity = int(os.environ.get("AB_CAPACITY", 100_000)) + att
    n_views = int(os.environ.get("AB_VIEWS", 24))
    n_hold = int(os.environ.get("AB_HOLDOUT", 4))

    _pet()
    scene, frames = build_scene(11, n_views, res, with_depth=True)
    hold_idx = set(np.linspace(0, n_views - 1, n_hold).astype(int).tolist())
    train_frames = [f for i, f in enumerate(frames) if i not in hold_idx]
    eval_frames = [f for i, f in enumerate(frames) if i in hold_idx]
    print(f"{len(train_frames)} train views, {len(eval_frames)} held out, "
          f"{res}x{res}", flush=True)
    _pet()

    base_render = RenderConfig(tile_capacity=1536)
    base = TrainConfig(
        iterations=iters, render=base_render, impl="tiled",
        background=(1.0, 1.0, 1.0), scene_extent=3.0,
        optim=OptimConfig(means_lr_max_steps=iters),
        densify=DensifyConfig(grad_threshold=1.5e-4),
        densify_from=300, densify_until=int(iters * 0.7),
        densify_interval=150, opacity_reset_interval=10_000,
        dynamic_pool=False, log_every=100,
    )
    arms = {
        "baseline": base,
        "absgrad": dataclasses.replace(
            base, render=dataclasses.replace(base_render, absgrad=True),
            densify=dataclasses.replace(base.densify, grad_threshold=6e-4)),
        "antialiased": dataclasses.replace(
            base, render=dataclasses.replace(base_render, antialiased=True)),
        "scale_reg": dataclasses.replace(base, scale_reg_lambda=0.02,
                                         scale_reg_max_ratio=8.0),
        "bilagrid": dataclasses.replace(base, bilateral_grid=True),
        "depth": dataclasses.replace(base, depth_lambda=0.1),
        "normal_reg": dataclasses.replace(
            base, normal_lambda=0.02,
            render=dataclasses.replace(base_render, render_normals=True)),
    }
    only = os.environ.get("AB_ARMS", "").strip()
    if only:
        keep = {a.strip() for a in only.split(",") if a.strip()}
        arms = {k: v for k, v in arms.items() if k in keep}

    # SfM-proxy init shared across arms (same points, same capacity)
    rng = np.random.default_rng(0)
    n_init = int(os.environ.get("AB_INIT", min(8_000, capacity // 4)))
    pts = scene.sample_surface(n_init, seed=1)
    pts = (pts + rng.normal(scale=0.01, size=pts.shape)).astype(np.float32)

    results = {}
    for name, cfg in arms.items():
        _pet()
        init = Gaussians.from_points(pts, sh_degree=2, capacity=capacity)
        trainer = Trainer(cfg, init, train_frames, eval_frames=eval_frames)
        t0 = time.time()
        trainer.run(progress=False, on_log=lambda m: _pet())
        _pet()
        dt = time.time() - t0
        g = trainer.state.gaussians
        ls = np.asarray(g.log_scales)
        alive = np.asarray(g.alive)
        ratio = float(np.median(np.exp(ls.max(-1) - ls.min(-1))[alive]))
        results[name] = {
            "eval_psnr": round(trainer.eval_psnr(), 2),
            "final_loss": round(trainer.history[-1]["loss"], 5),
            "alive": int(g.num_alive),
            "overflow": int(trainer.history[-1].get("overflow", 0)),
            "median_scale_ratio": round(ratio, 2),
            "iters_per_sec": round(cfg.iterations / dt, 2),
        }
        print(f"{name}: {results[name]}", flush=True)
        with open(out_path, "w") as fh:   # incremental: survive a late wedge
            json.dump({"config": {"res": res, "iters": iters,
                                  "capacity": capacity,
                                  "views": len(train_frames),
                                  "holdout": len(eval_frames),
                                  "scene": "flagship build_scene(11)"},
                       "arms": results}, fh, indent=1)

    print("AB_RESULTS " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
