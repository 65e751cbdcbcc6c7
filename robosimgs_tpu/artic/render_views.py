"""Canonical multi-view rendering of a mesh for segmentation/MLLM input.

The TPU-native stand-in for the reference's trimesh/OpenGL 6-view
renderer (`interactive_segmenter.py:255-381`): six axis-aligned views
(front/back/left/right/top/bottom), camera at `distance_factor` x the
bbox diagonal, fov 50°, square resolution, with optional colored point
markers; writes the same artifact contract (view_{name}.png,
view_{name}_marked.png, camera_params.json with intrinsics/c2w/
resolution — see `openbox_output/segmentation/camera_params.json`).
Rendering uses the tile-binned mesh rasterizer with headlight shading.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.render.mesh_raster import MeshRasterConfig, rasterize_mesh
from robosimgs_tpu.utils.meshio import Mesh

VIEW_DIRECTIONS: Dict[str, np.ndarray] = {
    "front": np.array([0.0, -1.0, 0.0]),
    "back": np.array([0.0, 1.0, 0.0]),
    "left": np.array([-1.0, 0.0, 0.0]),
    "right": np.array([1.0, 0.0, 0.0]),
    "top": np.array([0.0, 0.0, 1.0]),
    "bottom": np.array([0.0, 0.0, -1.0]),
}

# The reference's SimpleSegmenter variant works from two oblique views
# (`simple_segmenter.py:414-524`); selectable via view_names.
OBLIQUE_DIRECTIONS: Dict[str, np.ndarray] = {
    "top_oblique": np.array([0.7, -0.7, 0.8]),
    "bottom_oblique": np.array([0.7, -0.7, -0.8]),
}
ALL_DIRECTIONS = {**VIEW_DIRECTIONS, **OBLIQUE_DIRECTIONS}

MARKER_COLORS: List[Tuple[str, Tuple[float, float, float]]] = [
    ("RED", (1.0, 0.0, 0.0)), ("GREEN", (0.0, 1.0, 0.0)),
    ("BLUE", (0.0, 0.0, 1.0)), ("YELLOW", (1.0, 1.0, 0.0)),
]


def view_camera(mesh: Mesh, direction: np.ndarray, resolution: int = 800,
                fov_deg: float = 50.0, distance_factor: float = 2.0) -> Camera:
    center = mesh.center
    diag = float(np.linalg.norm(mesh.bounds[1] - mesh.bounds[0]))
    eye = center + direction / np.linalg.norm(direction) * distance_factor * diag
    up = [0, 0, 1] if abs(direction[2]) < 0.9 else [0, 1, 0]
    return Camera.look_at(eye, center, up, fov_deg, resolution, resolution)


def shade(mesh: Mesh, camera: Camera) -> np.ndarray:
    """Per-face headlight Lambertian colors (albedo from vertex colors
    or light gray; for UV-textured meshes this is the shading TERM only
    — the rasterizer multiplies the texture in per pixel)."""
    normals = mesh.face_normals()
    eye = np.asarray(camera.origin)
    to_cam = eye[None, :] - mesh.face_centroids()
    to_cam /= np.clip(np.linalg.norm(to_cam, axis=1, keepdims=True), 1e-9, None)
    lam = np.abs((normals * to_cam).sum(1))
    textured = mesh.uv is not None and mesh.texture is not None
    if mesh.vertex_colors is not None:
        # under a texture this is the glTF color MODULATION term — the
        # rasterizer multiplies the texture in per pixel
        albedo = mesh.vertex_colors[mesh.faces].mean(1)
    elif textured:
        albedo = np.ones((mesh.faces.shape[0], 3), np.float32)
    else:
        albedo = np.full((mesh.faces.shape[0], 3), 0.75, np.float32)
    return (albedo * (0.35 + 0.65 * lam)[:, None]).astype(np.float32)


def render_view(mesh: Mesh, camera: Camera,
                markers: Optional[Sequence[Tuple[np.ndarray, Tuple[float, float, float]]]] = None,
                mesh_cfg: MeshRasterConfig = MeshRasterConfig(tile_capacity=1024),
                background: float = 1.0, return_depth: bool = False):
    """Render one shaded view; markers are (world_point, rgb) dots.
    With return_depth, returns (img, depth (H, W), +inf on background) —
    the z-buffer the Segmenter's geometric view scoring samples for
    seed-point visibility."""
    face_colors = shade(mesh, camera)
    tex_kw = {}
    if mesh.uv is not None and mesh.texture is not None:
        tex_kw = dict(vertex_uvs=jnp.asarray(mesh.uv),
                      texture=jnp.asarray(mesh.texture))
    out = rasterize_mesh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                         camera, face_colors=jnp.asarray(face_colors),
                         cfg=mesh_cfg, **tex_kw)
    rgb = np.asarray(out["rgb"])
    mask = np.asarray(out["mask"])
    img = np.where(mask[..., None], rgb, background).astype(np.float32)
    depth = np.asarray(out["depth"])
    if markers:
        img = _draw_markers(img, depth, camera, markers)
    if return_depth:
        return img, depth
    return img


def _draw_markers(img, depth, camera: Camera, markers, radius_px: int = 8):
    w2c = np.asarray(camera.w2c)
    H, W = img.shape[:2]
    yy, xx = np.mgrid[0:H, 0:W]
    for point, color in markers:
        p = w2c[:3, :3] @ np.asarray(point) + w2c[:3, 3]
        if p[2] <= 0:
            continue
        u = float(camera.fx) * p[0] / p[2] + float(camera.cx) - 0.5
        v = float(camera.fy) * p[1] / p[2] + float(camera.cy) - 0.5
        # only draw if not occluded (allow small depth slack)
        ui, vi = int(round(u)), int(round(v))
        if not (0 <= ui < W and 0 <= vi < H):
            continue
        if np.isfinite(depth[vi, ui]) and p[2] > depth[vi, ui] + 0.05:
            continue
        circle = (xx - u) ** 2 + (yy - v) ** 2 <= radius_px**2
        img[circle] = color
    return img


def render_canonical_views(
    mesh: Mesh,
    out_dir: Optional[str] = None,
    resolution: int = 800,
    fov_deg: float = 50.0,
    distance_factor: float = 2.0,
    markers: Optional[Sequence[Tuple[np.ndarray, Tuple[float, float, float]]]] = None,
    view_names: Optional[Sequence[str]] = None,
) -> Dict[str, Dict]:
    """Render the canonical views (clean + marked); optionally write
    view_*.png / view_*_marked.png / camera_params.json artifacts.
    view_names selects a subset / oblique variants (default: the six
    axis-aligned views)."""
    views = {}
    cam_params = {}
    names = list(view_names) if view_names else list(VIEW_DIRECTIONS)
    for name in names:
        direction = ALL_DIRECTIONS[name]
        cam = view_camera(mesh, direction, resolution, fov_deg, distance_factor)
        clean, depth = render_view(mesh, cam, return_depth=True)
        marked = render_view(mesh, cam, markers=markers) if markers else clean
        views[name] = {"camera": cam, "clean": clean, "marked": marked,
                       "depth": depth}
        K = np.array([[float(cam.fx), 0, float(cam.cx)],
                      [0, float(cam.fy), float(cam.cy)], [0, 0, 1.0]])
        cam_params[name] = {
            "intrinsics": K.tolist(),
            "c2w": np.asarray(cam.c2w).tolist(),
            "resolution": [resolution, resolution],
        }
        if out_dir:
            from PIL import Image
            os.makedirs(out_dir, exist_ok=True)
            for tag, im in (("", clean), ("_marked", marked)):
                Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, f"view_{name}{tag}.png"))
    if out_dir:
        with open(os.path.join(out_dir, "camera_params.json"), "w") as fh:
            json.dump(cam_params, fh, indent=2)
    return views
