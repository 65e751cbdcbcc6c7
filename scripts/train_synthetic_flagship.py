"""Flagship-scale reconstruction proof: 512^2 multi-view, 500k capacity.

BASELINE.md configs 2/3 evidence (VERDICT r2 next-steps #1): a
texture-rich synthetic capture (per-face color noise on dozens of
bodies = high-frequency detail that REQUIRES densification to fit),
~48 cameras on two rings rendered by the framework's own mesh
rasterizer, SfM-proxy init (noisy surface samples), 500k-capacity pool
growing from a small init via densify/prune, held-out PSNR reported.

Run: OPENBOX-style envs -> SYN_RES / SYN_ITERS / SYN_CAPACITY /
SYN_INIT / SYN_VIEWS / SYN_HOLDOUT.
  bash scripts/tpu_run.sh scripts/train_synthetic_flagship.py [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from wedgeguard import start_wedge_guard  # noqa: E402

_pet = start_wedge_guard()


def build_scene(seed: int, n_cameras: int, res: int,
                with_depth: bool = False):
    """Floor + ~40 bodies with per-face color noise, cameras on two
    rings (the texture detail drives densification; vertex-gradient
    boxes are too smooth to need >10k gaussians). with_depth attaches
    the mesh z-buffer (0 on background) for depth-supervision arms."""
    import numpy as np

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.render.mesh_raster import (MeshRasterConfig,
                                                  rasterize_mesh)
    from robosimgs_tpu.train.data import Frame
    from robosimgs_tpu.utils.meshio import Mesh, concatenate

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def box(center, size):
        sx, sy, sz = size
        v = np.array([[x, y, z] for x in (-sx, sx) for y in (-sy, sy)
                      for z in (-sz, sz)], np.float32) + np.asarray(
                          center, np.float32)
        f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
        return Mesh(v, f)

    # floor as an 8x8 grid of plates: a single full-extent triangle
    # covers ~500 tiles at 512^2 and silently exceeded max_tiles_per_tri
    # (=128) in the r3 first runs, truncating the floor out of the
    # TARGETS view-dependently (white holes; stats are asserted below)
    parts = []
    for gx in range(8):
        for gy in range(8):
            cx = -1.3 + (2 * gx + 1) * 1.3 / 8
            cy = -1.3 + (2 * gy + 1) * 1.3 / 8
            parts.append(box((cx, cy, -0.55), (1.3 / 8, 1.3 / 8, 0.05)))
    n_floor = len(parts)
    for _ in range(40):
        center = rng.uniform(-0.85, 0.85, 3) * np.array([1, 1, 0.35])
        size = rng.uniform(0.05, 0.22, 3)
        parts.append(box(center, size))
    scene = concatenate(parts)
    # per-face color noise on a per-part base hue = high-frequency
    # texture (each face its own shade)
    fc = []
    floor_base = rng.uniform(0.3, 0.8, 3)
    for i, p in enumerate(parts):
        base = floor_base if i < n_floor else rng.uniform(0.15, 0.95, 3)
        n = p.faces.shape[0]
        fc.append(np.clip(base[None] * rng.uniform(0.45, 1.0, (n, 1)),
                          0, 1))
    face_colors = np.concatenate(fc).astype(np.float32)

    frames = []
    # program-key perturbation must reach the MESH RASTER programs too:
    # the capacity bump alone leaves them identical, so a retry after a
    # wedge in the scene build resubmits the same poisoned key
    attempt = 16 * int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
    mcfg = MeshRasterConfig(tile_capacity=1024 + attempt,
                            max_tiles_per_tri=256)
    for i in range(n_cameras):
        ring = i % 2
        ang = 2 * np.pi * (i // 2) / (n_cameras // 2) + ring * 0.21
        # both rings look well DOWN at the scene: the floor plate is a
        # big thin surface, and grazing-angle-only coverage leaves it
        # unreconstructable (white holes in the r3 first run)
        el = (1.5, 2.6)[ring]
        eye = [2.6 * np.cos(ang), 2.6 * np.sin(ang), el]
        cam = Camera.look_at(eye, [0, 0, -0.1], [0, 0, 1], 55.0, res, res)
        out = rasterize_mesh(jnp.asarray(scene.vertices),
                             jnp.asarray(scene.faces), cam,
                             face_colors=jnp.asarray(face_colors), cfg=mcfg)
        st = jax.tree_util.tree_map(int, jax.device_get(out["stats"]))
        assert st.truncated_gaussians == 0 and st.overflowed_tiles == 0, (
            f"target render truncated (cam {i}): {st} — raise "
            "MeshRasterConfig capacities")
        img = np.where(np.asarray(out["mask"])[..., None],
                       np.asarray(out["rgb"]), 1.0).astype(np.float32)
        dep = None
        if with_depth:
            dep = np.where(np.asarray(out["mask"]),
                           np.asarray(out["depth"]), 0.0).astype(np.float32)
        frames.append(Frame(camera=cam, image=img, depth=dep))
        _pet()     # the first mesh-raster compile through the tunnel is
        #            slow; don't let the wedge watchdog shoot a healthy run
    return scene, frames


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/syn_flagship"
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)

    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.train.densify import DensifyConfig
    from robosimgs_tpu.train.optim import OptimConfig
    from robosimgs_tpu.train.trainer import TrainConfig, Trainer

    res = int(os.environ.get("SYN_RES", 512))
    iters = int(os.environ.get("SYN_ITERS", 6000))
    attempt = 16 * int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
    capacity = int(os.environ.get("SYN_CAPACITY", 500_000)) + attempt
    n_init = int(os.environ.get("SYN_INIT", 20_000))
    n_views = int(os.environ.get("SYN_VIEWS", 48))
    n_hold = int(os.environ.get("SYN_HOLDOUT", 6))

    scene, frames = build_scene(11, n_views, res)
    hold_idx = set(np.linspace(0, n_views - 1, n_hold).astype(int).tolist())
    train_frames = [f for i, f in enumerate(frames) if i not in hold_idx]
    eval_frames = [f for i, f in enumerate(frames) if i in hold_idx]
    print(f"{len(train_frames)} train views, {len(eval_frames)} held out, "
          f"{res}x{res}", flush=True)

    # SfM-proxy init: noisy surface samples (sigma 1 cm at ~3 m scale)
    rng = np.random.default_rng(0)
    pts = scene.sample_surface(n_init, seed=1)
    pts = pts + rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    init = Gaussians.from_points(pts.astype(np.float32), sh_degree=2,
                                 capacity=capacity)

    cfg = TrainConfig(
        iterations=iters,
        render=RenderConfig(tile_capacity=2048),
        impl="auto",
        background=(1.0, 1.0, 1.0),
        scene_extent=3.0,
        optim=OptimConfig(means_lr_max_steps=iters),
        densify=DensifyConfig(grad_threshold=float(
            os.environ.get("SYN_GRAD_THRESH", 1.5e-4))),
        densify_from=400,
        densify_until=int(0.7 * iters),
        densify_interval=int(os.environ.get("SYN_DENSIFY_INTERVAL", 120)),
        # no opacity resets: white bg + thin floor at partly-grazing
        # angles never recovers from the clamp (same finding as the
        # openbox 6-view runs)
        opacity_reset_interval=10_000,
        dynamic_pool=False,
        log_every=100,
    )
    print(f"init {len(pts)} pts, capacity {capacity}, iters {iters}",
          flush=True)

    trainer = Trainer(cfg, init, train_frames, eval_frames=eval_frames)
    _pet()
    t0 = time.time()
    trainer.run(progress=True, on_log=lambda m: _pet())
    _pet()
    dt = time.time() - t0

    train_psnr = trainer.history[-1]["psnr"]
    eval_psnr = trainer.eval_psnr()
    alive = int(trainer.state.gaussians.num_alive)
    print(f"RESULT iters={iters} ({iters/dt:.1f} it/s) "
          f"train_psnr={train_psnr:.2f} eval_psnr={eval_psnr:.2f} "
          f"alive={alive}", flush=True)

    from PIL import Image

    from robosimgs_tpu.render.rasterize import rasterize
    for tag, fr in [("eval", eval_frames[0]), ("train0", train_frames[0])]:
        out = rasterize(trainer.state.gaussians, fr.camera, cfg.render,
                        background=jnp.ones(3),
                        impl="tiled" if jax.default_backend() == "tpu"
                        else "reference")
        img = np.clip(np.asarray(out["rgb"]), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"render_{tag}.png"))
        Image.fromarray((np.clip(fr.image, 0, 1) * 255).astype(
            np.uint8)).save(os.path.join(out_dir, f"target_{tag}.png"))
    with open(os.path.join(out_dir, "result.json"), "w") as fh:
        json.dump({"train_psnr": float(train_psnr),
                   "eval_psnr": float(eval_psnr),
                   "iters_per_sec": iters / dt,
                   "iterations": iters, "views": len(train_frames),
                   "capacity": capacity, "init_points": int(len(pts)),
                   "final_alive": alive, "resolution": [res, res],
                   "history": trainer.history}, fh, indent=1)
    print(f"artifacts in {out_dir}", flush=True)


if __name__ == "__main__":
    main()
