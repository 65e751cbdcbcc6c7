"""A/B convergence evidence for the splatfacto-parity quality features.

Trains the structured mesh scene (the realistic convergence benchmark,
train/data.synthetic_mesh_scene) at 512x512 under four arms — baseline,
absgrad densification, antialiased (mip-splatting) mode, scale
regularizer — and reports eval PSNR + alive counts per arm, the
"variants work, with numbers" evidence VERDICT r1 item 9 asks for.

Run: bash scripts/tpu_run.sh scripts/ab_features.py
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
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)

    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.train.data import synthetic_mesh_scene, train_eval_split
    from robosimgs_tpu.train.trainer import TrainConfig, Trainer

    res = int(os.environ.get("AB_RES", 512))
    iters = int(os.environ.get("AB_ITERS", 1200))
    _pet()
    _, frames = synthetic_mesh_scene(seed=4, n_cameras=24,
                                     width=res, height=res,
                                     with_depth=True)
    train_frames, eval_frames = train_eval_split(frames, 8)
    _pet()

    base_render = RenderConfig(tile_capacity=512, max_tiles_per_gaussian=16)
    base = TrainConfig(
        iterations=iters, render=base_render, impl="tiled",
        background=(1.0, 1.0, 1.0), scene_extent=1.5,
        densify_from=300, densify_until=int(iters * 0.8),
        densify_interval=150, opacity_reset_interval=10_000,
        dynamic_pool=False, log_every=200,
    )
    arms = {
        "baseline": base,
        "absgrad": dataclasses.replace(
            base, render=dataclasses.replace(base_render, absgrad=True),
            densify=dataclasses.replace(base.densify, grad_threshold=8e-4)),
        "antialiased": dataclasses.replace(
            base, render=dataclasses.replace(base_render, antialiased=True)),
        "scale_reg": dataclasses.replace(base, scale_reg_lambda=0.02,
                                         scale_reg_max_ratio=8.0),
        # the r2 quality features at scale (VERDICT r2 #1 asks for the
        # A/B "re-run at that scale" for bilagrid/depth/normal too)
        "bilagrid": dataclasses.replace(base, bilateral_grid=True),
        "depth": dataclasses.replace(base, depth_lambda=0.1),
        "normal_reg": dataclasses.replace(
            base, normal_lambda=0.02,
            render=dataclasses.replace(base_render, render_normals=True)),
    }

    rng = np.random.default_rng(0)
    results = {}
    for name, cfg in arms.items():
        _pet()
        pts = rng.uniform(-1.2, 1.2, (4000, 3)).astype(np.float32) \
            * np.array([1, 1, 0.5], np.float32)
        att = 16 * int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
        init = Gaussians.from_points(pts, sh_degree=2,
                                     capacity=60_000 + att)
        trainer = Trainer(cfg, init, train_frames, eval_frames=eval_frames)
        t0 = time.time()
        trainer.run(progress=False)
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
            "median_scale_ratio": round(ratio, 2),
            "iters_per_sec": round(cfg.iterations / dt, 2),
        }
        print(f"{name}: {results[name]}", flush=True)

    print("AB_RESULTS " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
