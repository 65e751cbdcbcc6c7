"""Render a trained 3DGS scene (.ply) from chosen viewpoints.

Interop face of the PLY interchange (`/root/reference/README.md:75`
"export .ply ... viewable in real-time renderers"): scenes trained here
or by any standard 3DGS stack (Nerfstudio/gsplat) render identically.
Cameras come from a transforms.json, an orbit, or explicit look-at.
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="Render a 3DGS .ply scene")
    p.add_argument("scene", help=".ply in standard 3DGS layout")
    p.add_argument("--output", required=True, help="output dir or file")
    p.add_argument("--transforms", default=None,
                   help="render the cameras of a transforms.json")
    p.add_argument("--orbit", type=int, default=0,
                   help="render N orbit views around the scene center")
    p.add_argument("--eye", type=float, nargs=3, default=None)
    p.add_argument("--target", type=float, nargs=3, default=[0, 0, 0])
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--background", type=float, nargs=3, default=[1, 1, 1])
    p.add_argument("--sh-degree", type=int, default=None)
    p.add_argument("--impl", default="auto")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.render.rasterize import rasterize
    from robosimgs_tpu.train.data import parse_transforms_json
    from robosimgs_tpu.train.io_ply import load_ply

    g = load_ply(args.scene)
    print(f"loaded {args.scene}: {int(g.num_alive)} gaussians, "
          f"SH degree {g.sh_degree}")

    cams = []
    names = []
    if args.transforms:
        for i, f in enumerate(parse_transforms_json(args.transforms)):
            cams.append(f.camera)
            names.append(f"view_{i:04d}")
    elif args.orbit:
        alive = np.asarray(g.alive)
        pts = np.asarray(g.means)[alive]
        center = np.median(pts, 0)
        radius = 2.0 * np.percentile(np.linalg.norm(pts - center, axis=1), 90)
        for i in range(args.orbit):
            ang = 2 * np.pi * i / args.orbit
            eye = center + radius * np.array(
                [np.cos(ang), np.sin(ang), 0.4])
            cams.append(Camera.look_at(eye, center, [0, 0, 1], args.fov,
                                       args.width, args.height))
            names.append(f"orbit_{i:04d}")
    elif args.eye:
        cams.append(Camera.look_at(args.eye, args.target, [0, 0, 1],
                                   args.fov, args.width, args.height))
        names.append("view")
    else:
        raise SystemExit("one of --transforms / --orbit / --eye required")

    bg = jnp.asarray(args.background, jnp.float32)
    single = len(cams) == 1 and not os.path.isdir(args.output) \
        and args.output.lower().endswith((".png", ".jpg"))
    if not single:
        os.makedirs(args.output, exist_ok=True)
    for cam, name in zip(cams, names):
        out = rasterize(g, cam, sh_degree=args.sh_degree, background=bg,
                        impl=args.impl)
        img = (np.clip(np.asarray(out["rgb"]), 0, 1) * 255).astype(np.uint8)
        path = args.output if single else os.path.join(args.output,
                                                       f"{name}.png")
        Image.fromarray(img).save(path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
