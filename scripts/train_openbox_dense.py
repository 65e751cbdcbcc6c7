"""Dense-capture reconstruction of the real openbox scan at 800x800.

The reference ships only SIX posed views of its scanned object — a
novel-view ceiling of ~29.6 dB for any method (r3,
docs/evidence/openbox_flagship_r3_800.json). This script removes the
capture-density limit using the framework's own appearance-recovery
path: bake the six views' colors onto the (subdivided) scan mesh
(`utils/bake.py`, z-buffer-visibility back-projection), then render a
DENSE synthetic capture of the real geometry (+recovered appearance)
and train at full 800^2 with densification. Held-out dense views give
novel-view PSNR; the six real views are re-scored as a secondary
appearance-gap diagnostic.

Run: bash scripts/tpu_run.sh scripts/train_openbox_dense.py [out_dir]
Envs: DENSE_VIEWS/DENSE_RES/DENSE_ITERS/DENSE_CAPACITY/DENSE_INIT/
DENSE_SUBDIV/DENSE_HOLDOUT.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from wedgeguard import start_wedge_guard  # noqa: E402

SEG = "/root/reference/Articulation/openbox_output/segmentation"
PARTS = "/root/reference/Articulation/openbox_output/parts"

# this job's big chunked 800^2 mesh-raster program legitimately
# compiles for ~15 min through the tunnel — default the wedge window
# wide (RSGS_WEDGE_S still overrides inside start_wedge_guard)
_pet = start_wedge_guard(1500.0)


def build_transforms(out_dir: str) -> str:
    """camera_params.json -> nerfstudio transforms.json (same conversion
    as scripts/train_openbox_views.py)."""
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


def build_dataset(out_dir: str, n_views: int, res: int, subdiv: int):
    """Bake + dense-render; cached as <out_dir>/dense_dataset.npz."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.render.mesh_raster import (MeshRasterConfig,
                                                  rasterize_mesh)
    from robosimgs_tpu.train.data import Frame, parse_transforms_json
    from robosimgs_tpu.utils.bake import (bake_appearance_from_views,
                                          bake_vertex_colors_from_views,
                                          eval_baked_colors, subdivide_mesh)
    from robosimgs_tpu.utils.meshio import concatenate, load_mesh, save_mesh

    # DENSE_APPEARANCE=dir1 bakes a per-vertex degree-1 directional
    # color model (+ per-view exposure solve) instead of the diffuse
    # average: the dense targets then carry the view-dependent shading
    # the six source renders contain, instead of blurring it away
    appearance = os.environ.get("DENSE_APPEARANCE", "diffuse")
    mode_flag = {"diffuse": 0, "dir1": 1}[appearance]
    dir_reg = float(os.environ.get("DENSE_DIR_REG", 0.25))
    cache = os.path.join(out_dir, "dense_dataset.npz")
    tj = build_transforms(out_dir)
    ref_frames = parse_transforms_json(tj)      # six real views, 800^2
    names = [f["view_name"] for f in json.load(open(tj))["frames"]]

    mesh = concatenate([load_mesh(os.path.join(PARTS, "body.glb")),
                        load_mesh(os.path.join(PARTS, "lid.glb"))])
    mesh = subdivide_mesh(mesh, subdiv)
    print(f"mesh: {mesh.vertices.shape[0]} verts, "
          f"{mesh.faces.shape[0]} faces after {subdiv} subdiv", flush=True)

    if os.path.exists(cache):
        data = np.load(cache)
        meta = tuple(int(x) for x in
                     (data["meta"] if "meta" in data else np.zeros(3)))
        base = (n_views, res, subdiv)
        # appearance hyperparameters are part of the cache key: a dir1
        # rerun with a different dir_reg must rebuild, not silently
        # reuse the stale bake (older caches wrote 3/4-element metas)
        accept = ([base, base + (0,), base + (0, 0)] if mode_flag == 0
                  else [base + (1, int(round(dir_reg * 1000)))])
        if (meta in accept
                and "baked_colors" in data
                and data["baked_colors"].shape[0] == mesh.vertices.shape[0]):
            mesh.vertex_colors = data["baked_colors"]
            imgs = data["images"]
            c2ws = data["c2ws"]
            fxfycxcy = data["intrinsics"]
            frames = []
            for i in range(imgs.shape[0]):
                fx, fy, cx, cy = fxfycxcy[i]
                K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                             np.float32)
                cam = Camera.from_opencv(K, c2ws[i], res, res)
                frames.append(Frame(camera=cam, image=imgs[i]))
            print(f"loaded cached dataset: {len(frames)} views", flush=True)
            return mesh, frames, ref_frames, names
        print("cache config mismatch — rebuilding dataset", flush=True)

    # -- bake appearance from the six real views --
    t0 = time.time()
    attempt = 16 * int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
    imgs6 = [f.load(background=(1, 1, 1)) for f in ref_frames]
    cams6 = [f.camera for f in ref_frames]
    tile_k = int(os.environ.get("DENSE_TILE_K", 32768))
    baked = None
    if appearance == "dir1":
        baked = bake_appearance_from_views(
            mesh, imgs6, cams6, tile_capacity=tile_k + attempt,
            max_tiles_per_tri=256, tri_chunk=512, pet=_pet,
            exposure=True, degree=1, dir_reg=dir_reg)
        colors, seen = baked.sh0, baked.seen
        print(f"exposure gains: {np.round(baked.view_gain, 3).tolist()}",
              flush=True)
    else:
        colors, seen = bake_vertex_colors_from_views(
            mesh, imgs6, cams6, tile_capacity=tile_k + attempt,
            max_tiles_per_tri=256, tri_chunk=512, pet=_pet)
    mesh.vertex_colors = colors
    print(f"bake[{appearance}]: {seen.mean()*100:.1f}% verts seen, "
          f"{time.time()-t0:.1f}s", flush=True)
    save_mesh(os.path.join(out_dir, "baked.ply"), mesh)

    # -- dense cameras: rings matched to the real capture's scale --
    center = mesh.center
    dists = [float(np.linalg.norm(np.asarray(c.origin) - center))
             for c in cams6]
    radius = float(np.mean(dists))
    fov = 2.0 * np.degrees(np.arctan(400.0 / float(cams6[0].fx)))
    mcfg = MeshRasterConfig(tile_capacity=tile_k + attempt,
                            max_tiles_per_tri=256, tri_chunk=512)
    elevations = (-42.0, -12.0, 20.0, 52.0)
    per_ring = max(n_views // len(elevations), 1)
    frames = []
    jv, jf = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    jc = jnp.asarray(mesh.vertex_colors)
    for i in range(n_views):
        ring = i % len(elevations)
        az = 2 * np.pi * (i // len(elevations)) / per_ring + 0.13 * ring
        el = np.radians(elevations[ring])
        eye = center + radius * np.asarray([
            np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)])
        up = [0, 0, 1]
        cam = Camera.look_at(eye, center, up, fov, res, res)
        if baked is not None:
            # per-view directional appearance; colors stay a traced
            # input, so every view reuses ONE compiled raster program
            jc = jnp.asarray(eval_baked_colors(
                baked, mesh.vertices, np.asarray(cam.origin)))
        out = rasterize_mesh(jv, jf, cam, vertex_colors=jc, cfg=mcfg)
        st = jax.tree_util.tree_map(int, jax.device_get(out["stats"]))
        assert st.truncated_gaussians == 0 and st.overflowed_tiles == 0, (
            f"target render truncated (cam {i}): {st} — raise capacities")
        img = np.where(np.asarray(out["mask"])[..., None],
                       np.asarray(out["rgb"]), 1.0).astype(np.float32)
        frames.append(Frame(camera=cam, image=img))
        _pet()
    np.savez_compressed(
        cache,
        images=np.stack([f.image for f in frames]),
        c2ws=np.stack([np.asarray(f.camera.c2w) for f in frames]),
        intrinsics=np.stack([
            np.asarray([float(f.camera.fx), float(f.camera.fy),
                        float(f.camera.cx), float(f.camera.cy)], np.float32)
            for f in frames]),
        baked_colors=mesh.vertex_colors,
        **({"baked_dir1": baked.dir1, "view_gain": baked.view_gain,
            "view_bias": baked.view_bias} if baked is not None else {}),
        meta=np.asarray([n_views, res, subdiv, mode_flag,
                         int(round(dir_reg * 1000)) if mode_flag else 0],
                        np.int64))
    print(f"rendered {n_views} dense views @ {res}^2", flush=True)
    return mesh, frames, ref_frames, names


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/openbox_dense"
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"backend={jax.default_backend()}", flush=True)

    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.train.data import camera_extent
    from robosimgs_tpu.train.densify import DensifyConfig
    from robosimgs_tpu.train.optim import OptimConfig
    from robosimgs_tpu.train.trainer import TrainConfig, Trainer

    res = int(os.environ.get("DENSE_RES", 800))
    n_views = int(os.environ.get("DENSE_VIEWS", 48))
    iters = int(os.environ.get("DENSE_ITERS", 7000))
    subdiv = int(os.environ.get("DENSE_SUBDIV", 2))
    attempt = 16 * int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
    capacity = int(os.environ.get("DENSE_CAPACITY", 400_000)) + attempt
    n_init = int(os.environ.get("DENSE_INIT", 25_000))
    n_hold = int(os.environ.get("DENSE_HOLDOUT", 6))

    mesh, frames, ref_frames, ref_names = build_dataset(
        out_dir, n_views, res, subdiv)
    hold_idx = set(np.linspace(0, n_views - 1, n_hold).astype(int).tolist())
    train_frames = [f for i, f in enumerate(frames) if i not in hold_idx]
    eval_frames = [f for i, f in enumerate(frames) if i in hold_idx]
    # DENSE_REAL_REPEAT=k mixes the six REAL capture views into training
    # (each repeated k times): the bake can only express its degree-1
    # appearance model, so view-dependent appearance it cannot carry is
    # recovered by the splats' own SH from the real views directly,
    # while the dense synthetic ring keeps novel-view geometry anchored
    # (VERDICT r4 item 6). With k > 0 the real-view PSNRs reported
    # below are partially TRAIN-set scores (there is no 7th real view
    # to hold out) — the held-out DENSE eval stays the novel-view
    # metric; results.json records the flag.
    real_repeat = int(os.environ.get("DENSE_REAL_REPEAT", 0))
    from robosimgs_tpu.train.data import Frame as _Frame
    if real_repeat > 0:
        for _ in range(real_repeat):
            for fr in ref_frames:
                train_frames.append(_Frame(
                    camera=fr.camera, image=fr.load(background=(1, 1, 1))))
    print(f"{len(train_frames)} train views "
          f"(+{real_repeat}x6 real), {len(eval_frames)} held out",
          flush=True)

    # init: colored noisy surface samples (SfM proxy on the real scan)
    rng = np.random.default_rng(0)
    pts, cols = mesh.sample_surface_colored(n_init, seed=1)
    pts = pts + rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    init = Gaussians.from_points(pts.astype(np.float32), colors=cols,
                                 sh_degree=2, capacity=capacity)

    cfg = TrainConfig(
        iterations=iters,
        render=RenderConfig(
            tile_capacity=int(os.environ.get("DENSE_TILE_CAP", 2048)),
            tile_chunk=int(os.environ.get("DENSE_TILE_CHUNK", 0))),
        impl="auto",
        background=(1.0, 1.0, 1.0),
        scene_extent=camera_extent(frames),
        optim=OptimConfig(means_lr_max_steps=iters),
        densify=DensifyConfig(grad_threshold=float(
            os.environ.get("DENSE_GRAD_THRESH", 1.5e-4))),
        densify_from=400,
        densify_until=int(0.7 * iters),
        densify_interval=int(os.environ.get("DENSE_DENSIFY_INTERVAL", 120)),
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

    appearance = os.environ.get("DENSE_APPEARANCE", "diffuse")
    dir_reg = float(os.environ.get("DENSE_DIR_REG", 0.25))
    train_psnr = trainer.history[-1]["psnr"]
    emetrics = trainer.eval_metrics()
    eval_psnr = emetrics["psnr"]
    alive = int(trainer.state.gaussians.num_alive)
    print(f"RESULT iters={iters} ({iters/dt:.1f} it/s) "
          f"appearance={appearance} "
          f"train_psnr={train_psnr:.2f} eval_psnr={eval_psnr:.2f} "
          f"eval_ssim={emetrics['ssim']:.4f} alive={alive}", flush=True)

    # the trained splat scene is a first-class artifact: rollout
    # rendering of the REAL object rides on it
    from robosimgs_tpu.train.io_ply import save_ply
    save_ply(os.path.join(out_dir, "scene.ply"), trainer.state.gaussians)

    # secondary: appearance gap vs the six REAL reference views
    from robosimgs_tpu.render.rasterize import rasterize
    impl = "tiled" if jax.default_backend() == "tpu" else "reference"
    real_psnrs = {}
    for name, fr in zip(ref_names, ref_frames):
        out = rasterize(trainer.state.gaussians, fr.camera, cfg.render,
                        background=jnp.ones(3), impl=impl)
        tgt = fr.load(background=(1, 1, 1))
        mse = float(np.mean((np.clip(np.asarray(out["rgb"]), 0, 1)
                             - tgt) ** 2))
        real_psnrs[name] = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        _pet()
    print("real-view PSNRs:", {k: round(v, 2) for k, v in real_psnrs.items()},
          flush=True)

    from PIL import Image
    for tag, fr in [("eval", eval_frames[0]), ("train0", train_frames[0])]:
        out = rasterize(trainer.state.gaussians, fr.camera, cfg.render,
                        background=jnp.ones(3), impl=impl)
        img = np.clip(np.asarray(out["rgb"]), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"render_{tag}.png"))
        Image.fromarray((np.clip(fr.image, 0, 1) * 255).astype(
            np.uint8)).save(os.path.join(out_dir, f"target_{tag}.png"))
    with open(os.path.join(out_dir, "result.json"), "w") as fh:
        json.dump({"train_psnr": float(train_psnr),
                   "eval_psnr": float(eval_psnr),
                   "eval_ssim": float(emetrics["ssim"]),
                   "real_view_psnrs": real_psnrs,
                   "iters_per_sec": iters / dt,
                   "iterations": iters, "views": len(train_frames),
                   "capacity": capacity, "init_points": int(len(pts)),
                   "final_alive": alive, "resolution": [res, res],
                   "subdiv": subdiv, "appearance": appearance,
                   "dir_reg": dir_reg,
                   "real_repeat": int(os.environ.get("DENSE_REAL_REPEAT",
                                                     0)),
                   "history": trainer.history}, fh, indent=1)
    print(f"artifacts in {out_dir}", flush=True)


if __name__ == "__main__":
    main()
