"""Headless URDF validation + optional articulation render.

Replacement for the reference's PyBullet GUI smoke test
(`/root/reference/Articulation/utils/test_pybullet.py:10-73`) and its
trimesh visualizer (`utils/visualize.py:14-116`): validates the
kinematic structure, sweeps the joint range via FK, and (with --render)
writes a turntable strip of the articulation using the mesh rasterizer.
Falls back to a real PyBullet check when the package is installed
(--pybullet).
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="Validate a generated URDF")
    p.add_argument("urdf", help="path to .urdf")
    p.add_argument("--render", default=None,
                   help="write an articulation strip PNG to this path")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--pybullet", action="store_true",
                   help="also load in PyBullet (if installed)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np

    from robosimgs_tpu.scenegen.urdf_fk import URDFModel

    model = URDFModel.parse(args.urdf)
    problems = model.validate()
    print(f"robot {model.name!r}: {len(model.links)} links, "
          f"{len(model.joints)} joints ({model.dof} movable)")
    for j in model.movable:
        print(f"  joint {j.name}: {j.type} axis={j.axis.tolist()} "
              f"limits=[{j.lower:.3f}, {j.upper:.3f}]")
    if problems:
        for p in problems:
            print(f"PROBLEM: {p}")
        raise SystemExit(1)
    print("kinematic validation: OK")

    if args.render:
        import jax.numpy as jnp
        from PIL import Image

        from robosimgs_tpu.artic.render_views import shade, view_camera
        from robosimgs_tpu.render.mesh_raster import rasterize_mesh
        from robosimgs_tpu.scenegen.rollout import ArticulatedObject
        from robosimgs_tpu.utils.meshio import Mesh, concatenate

        obj = ArticulatedObject.from_urdf(args.urdf)
        frames = []
        for q in np.linspace(0, 1, args.steps):
            qs = np.asarray([j.lower + q * (j.upper - j.lower)
                             for j in model.movable])
            posed = obj.posed_meshes(qs)
            merged = concatenate([
                Mesh(np.asarray(v), np.asarray(f),
                     np.asarray(c) if c is not None else None)
                for v, f, c in posed])
            cam = view_camera(merged, np.array([1.0, -1.0, 0.7]),
                              resolution=args.resolution)
            fc = shade(merged, cam)
            out = rasterize_mesh(jnp.asarray(merged.vertices),
                                 jnp.asarray(merged.faces), cam,
                                 face_colors=jnp.asarray(fc))
            img = np.where(np.asarray(out["mask"])[..., None],
                           np.asarray(out["rgb"]), 1.0)
            frames.append(img)
        strip = np.concatenate(frames, axis=1)
        Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8)
                        ).save(args.render)
        print(f"articulation strip written to {args.render}")

    if args.pybullet:
        try:
            import pybullet as pb
        except ImportError:
            print("pybullet not installed; skipped")
            return
        cid = pb.connect(pb.DIRECT)
        robot = pb.loadURDF(args.urdf)
        print(f"pybullet load: OK ({pb.getNumJoints(robot)} joints)")
        pb.disconnect(cid)


if __name__ == "__main__":
    main()
