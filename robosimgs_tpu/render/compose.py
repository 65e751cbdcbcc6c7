"""Depth-merged compositing of Gaussian splats and posed triangle meshes.

The render core of simulated-data generation (SURVEY.md §3.4
render_rollout, hard part #6): sim-posed object meshes are z-buffered
first; the splat background then composites with the mesh depth as a
per-pixel occlusion limit (Gaussians behind a surface are culled
per-pixel), and remaining transmittance falls through to the mesh color
(or the background color where no mesh covers the pixel). Gaussians in
front of the surface correctly veil it; semi-transparent media keep
their accumulated alpha.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.mesh_raster import MeshRasterConfig, rasterize_mesh
from robosimgs_tpu.render.project import project
from robosimgs_tpu.render.reference import composite_reference
from robosimgs_tpu.render.tiled import composite_tiled


def merge_mesh_layers(layers: List[Dict[str, jax.Array]]) -> Dict[str, jax.Array]:
    """Merge several rasterized mesh layers by nearest depth."""
    out = layers[0]
    for nxt in layers[1:]:
        closer = nxt["depth"] < out["depth"]
        out = {
            "rgb": jnp.where(closer[..., None], nxt["rgb"], out["rgb"]),
            "depth": jnp.minimum(out["depth"], nxt["depth"]),
            "mask": out["mask"] | nxt["mask"],
            "face_id": jnp.where(closer, nxt["face_id"], out["face_id"]),
        }
    return out


def render_composite(
    gaussians: Gaussians,
    camera: Camera,
    meshes: List[Tuple[jax.Array, jax.Array, Optional[jax.Array]]],
    cfg: RenderConfig = RenderConfig(),
    mesh_cfg: MeshRasterConfig = MeshRasterConfig(),
    background: Optional[jax.Array] = None,
    impl: str = "auto",
) -> Dict[str, jax.Array]:
    """Render splat background + posed meshes, depth-merged.

    meshes: list of (vertices (V,3) world-space, faces (F,3),
    vertex_colors (V,3) or None).
    Returns rgb, depth (mesh depth where present), alpha (splat alpha),
    mesh_mask.
    """
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    if impl == "auto":
        impl = "reference" if jax.default_backend() == "cpu" else "tiled"

    H, W = camera.height, camera.width
    if meshes:
        layers = [rasterize_mesh(v, f, camera, vertex_colors=c, cfg=mesh_cfg)
                  for (v, f, c) in meshes]
        mesh_out = merge_mesh_layers([
            {k: l[k] for k in ("rgb", "depth", "mask", "face_id")} for l in layers])
        depth_limit = mesh_out["depth"]
    else:
        mesh_out = {
            "rgb": jnp.zeros((H, W, 3)),
            "depth": jnp.full((H, W), jnp.inf),
            "mask": jnp.zeros((H, W), bool),
            "face_id": jnp.full((H, W), -1, jnp.int32),
        }
        depth_limit = None

    proj = project(gaussians, camera, cfg)
    zero_bg = jnp.zeros((3,), jnp.float32)
    if impl == "reference":
        splat = composite_reference(proj, W, H, cfg, zero_bg, depth_limit=depth_limit)
    else:
        splat = composite_tiled(proj, W, H, cfg, zero_bg, depth_limit=depth_limit)

    # transmittance falls through to mesh surface, then to background
    behind = jnp.where(mesh_out["mask"][..., None], mesh_out["rgb"], background)
    rgb = splat["rgb"] + (1.0 - splat["alpha"])[..., None] * behind
    return {
        "rgb": rgb,
        "alpha": splat["alpha"],
        "depth": mesh_out["depth"],
        "splat_depth": splat["depth"],
        "mesh_mask": mesh_out["mask"],
        "face_id": mesh_out["face_id"],
    }
