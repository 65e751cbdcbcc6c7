"""Train 3DGS on the reference's shipped openbox views (real-object data).

The offline environment has no COLMAP capture; the closest real-image
multi-view data is the reference's committed worked example — six
800x800 renders of its actual iPhone-scanned openbox object with full
intrinsics + extrinsics (`openbox_output/segmentation/{view_*.png,
camera_params.json}`). This script converts those cameras into a
Nerfstudio transforms.json, trains through the standard ingestion path
(parse_transforms_json -> Trainer), holds out one view, and reports
train/eval PSNR — the end-to-end real-data evidence for BASELINE.md
metric 2 that the environment permits.

Run: bash scripts/tpu_run.sh scripts/train_openbox_views.py [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEG = "/root/reference/Articulation/openbox_output/segmentation"
PARTS = "/root/reference/Articulation/openbox_output/parts"
EVAL_VIEW = "right"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from wedgeguard import start_wedge_guard  # noqa: E402

_pet = start_wedge_guard()   # no-op on JAX_PLATFORMS=cpu


def build_transforms(out_dir: str) -> str:
    cams = json.load(open(os.path.join(SEG, "camera_params.json")))
    frames = []
    for name, c in cams.items():
        K = c["intrinsics"]
        frames.append({
            "file_path": os.path.join(SEG, f"view_{name}.png"),
            "transform_matrix": c["c2w"],
            "fl_x": K[0][0], "fl_y": K[1][1],
            "cx": K[0][2], "cy": K[1][2],
            "w": c["resolution"][0], "h": c["resolution"][1],
            "view_name": name,
        })
    path = os.path.join(out_dir, "transforms.json")
    with open(path, "w") as fh:
        json.dump({"frames": frames}, fh, indent=1)
    return path


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/openbox_train"
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)

    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.train.data import camera_extent, parse_transforms_json
    from robosimgs_tpu.train.trainer import TrainConfig, Trainer
    from robosimgs_tpu.utils.meshio import load_mesh

    tj = build_transforms(out_dir)
    ds = int(os.environ.get("OPENBOX_DOWNSCALE", 2))          # 2 -> 400x400
    frames = parse_transforms_json(tj, downscale=ds)
    names = [f["view_name"] for f in json.load(open(tj))["frames"]]
    train_frames = [f for f, n in zip(frames, names) if n != EVAL_VIEW]
    eval_frames = [f for f, n in zip(frames, names) if n == EVAL_VIEW]
    print(f"{len(train_frames)} train views, eval view: {EVAL_VIEW}",
          flush=True)

    # camera-convention sanity: object vertices must project into frame
    body = load_mesh(os.path.join(PARTS, "body.glb"))
    cam0 = train_frames[0].camera
    w2c = np.linalg.inv(np.asarray(cam0.c2w))
    p = body.vertices @ w2c[:3, :3].T + w2c[:3, 3]
    z = p[:, 2]
    u = p[:, 0] / z * float(cam0.fx) + float(cam0.cx)
    v = p[:, 1] / z * float(cam0.fy) + float(cam0.cy)
    inside = ((z > 0) & (u >= 0) & (u < cam0.width)
              & (v >= 0) & (v < cam0.height)).mean()
    print(f"convention check: {inside*100:.0f}% of body verts project "
          f"in-frame (z>0)", flush=True)
    assert inside > 0.5, "camera convention mismatch"

    # init from the scanned object's surfaces (OPENBOX_INIT small =
    # densification does the work — the VERDICT r2 "small init" config)
    lid = load_mesh(os.path.join(PARTS, "lid.glb"))
    extent = camera_extent(frames)
    # wedges are PROGRAM-KEYED (CLAUDE.md): fold the retry attempt into
    # a static shape so a retry never resubmits a poisoned program
    attempt = 16 * int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
    capacity = int(os.environ.get("OPENBOX_CAPACITY", 120_000)) + attempt
    n_init = min(int(os.environ.get("OPENBOX_INIT", 30_000)), capacity // 2)
    pts = np.concatenate([
        body.sample_surface(n_init * 5 // 6, seed=0),
        lid.sample_surface(n_init // 6, seed=1)])
    iters = int(os.environ.get("OPENBOX_ITERS", 3000))
    init = Gaussians.from_points(
        pts.astype(np.float32),
        sh_degree=int(os.environ.get("OPENBOX_SH", 2)), capacity=capacity)

    from robosimgs_tpu.train.densify import DensifyConfig
    from robosimgs_tpu.train.optim import OptimConfig

    cfg = TrainConfig(
        iterations=iters,
        render=RenderConfig(tile_capacity=int(
            os.environ.get("OPENBOX_TILE_CAP", 1024))),
        impl="auto",
        background=(1.0, 1.0, 1.0),
        scene_extent=extent,
        # lr-decay horizon tied to the schedule length (splatfacto
        # scales means_lr_max_steps to max iterations the same way)
        optim=OptimConfig(means_lr_max_steps=iters),
        densify=DensifyConfig(grad_threshold=float(
            os.environ.get("OPENBOX_GRAD_THRESH", 2.0e-4))),
        densify_from=300,
        densify_until=int(os.environ.get("OPENBOX_DENSIFY_UNTIL",
                                         int(0.8 * iters))),
        densify_interval=int(os.environ.get("OPENBOX_DENSIFY_INTERVAL", 150)),
        opacity_reset_interval=10_000,   # white bg: resets hurt at 6 views
        dynamic_pool=False,              # bound TPU recompiles
        log_every=100,
    )
    print(f"scene extent {extent:.2f}, init {len(pts)} pts, "
          f"capacity {capacity}, iters {iters}", flush=True)

    trainer = Trainer(cfg, init, train_frames, eval_frames=eval_frames)
    _pet()
    t0 = time.time()
    trainer.run(progress=True, on_log=lambda m: _pet())
    _pet()
    dt = time.time() - t0
    it_s = cfg.iterations / dt

    train_psnr = trainer.history[-1]["psnr"]
    eval_psnr = trainer.eval_psnr()
    print(f"RESULT iters={cfg.iterations} ({it_s:.1f} it/s) "
          f"train_psnr={train_psnr:.2f} eval_psnr={eval_psnr:.2f} "
          f"alive={int(trainer.state.gaussians.num_alive)}", flush=True)

    # save renders for visual inspection
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
    with open(os.path.join(out_dir, "result.json"), "w") as fh:
        json.dump({"train_psnr": float(train_psnr),
                   "eval_psnr": float(eval_psnr),
                   "iters_per_sec": it_s,
                   "iterations": cfg.iterations,
                   "views": len(train_frames),
                   "capacity": capacity, "init_points": int(len(pts)),
                   "final_alive": int(trainer.state.gaussians.num_alive),
                   "resolution": [cam0.width, cam0.height],
                   "history": trainer.history}, fh, indent=1)
    print(f"artifacts in {out_dir}", flush=True)


if __name__ == "__main__":
    main()
