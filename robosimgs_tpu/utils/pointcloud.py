"""Point-cloud projection / depth-map / mask-transfer utilities.

The jnp equivalents of the reference's torch/torch_scatter point utils
(`/root/reference/Articulation/utils/point_utils.py:12-111`):

  project_pcd     — world -> camera -> pixel coordinates
  unproject_pcd   — pixels + depth -> camera/world points
  depth_map_from_points — z-buffer scatter-min (torch_scatter's role,
                    trivially native in XLA via segment_min; SURVEY §2.2)
  sample_mask_at_points — bilinear mask sampling at projected points
                    with optional depth-consistency test (the
                    F.grid_sample role)

Cameras follow the package-wide OpenCV/pixel-center conventions
(core/camera.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from robosimgs_tpu.core.camera import Camera


def project_pcd(points: jax.Array, camera: Camera) -> Tuple[jax.Array, jax.Array]:
    """(N,3) world points -> ((N,2) pixel uv, (N,) camera depth)."""
    w2c = camera.w2c
    p = points @ w2c[:3, :3].T + w2c[:3, 3]
    z = p[:, 2]
    zs = jnp.where(z > 1e-9, z, 1.0)
    u = camera.fx * p[:, 0] / zs + camera.cx - 0.5
    v = camera.fy * p[:, 1] / zs + camera.cy - 0.5
    return jnp.stack([u, v], -1), z


def unproject_pcd(uv: jax.Array, depth: jax.Array, camera: Camera,
                  to_world: bool = True) -> jax.Array:
    """(N,2) pixel coords + (N,) depth -> (N,3) points."""
    x = (uv[:, 0] + 0.5 - camera.cx) / camera.fx * depth
    y = (uv[:, 1] + 0.5 - camera.cy) / camera.fy * depth
    cam_pts = jnp.stack([x, y, depth], -1)
    if not to_world:
        return cam_pts
    c2w = camera.c2w
    return cam_pts @ c2w[:3, :3].T + c2w[:3, 3]


def depth_map_from_points(points: jax.Array, camera: Camera,
                          downscale: int = 2) -> jax.Array:
    """Z-buffer depth map from a point cloud via segment-min scatter.

    Matches the reference's strategy (`point_utils.py:45-73`): z-buffer
    at 1/downscale resolution then nearest-upsample; empty pixels +inf.
    """
    H, W = camera.height, camera.width
    h, w = H // downscale, W // downscale
    uv, z = project_pcd(points, camera)
    ui = jnp.round(uv[:, 0] / downscale).astype(jnp.int32)
    vi = jnp.round(uv[:, 1] / downscale).astype(jnp.int32)
    valid = (z > 1e-9) & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    flat = jnp.where(valid, vi * w + ui, h * w)   # sink bin for invalid
    z_masked = jnp.where(valid, z, jnp.inf)
    depth = jax.ops.segment_min(z_masked, flat, num_segments=h * w + 1,
                                indices_are_sorted=False)
    small = depth[: h * w].reshape(h, w)
    return jnp.repeat(jnp.repeat(small, downscale, 0), downscale, 1)[:H, :W]


def sample_mask_at_points(
    mask: jax.Array,                     # (H, W) float or bool
    points: jax.Array,                   # (N, 3) world
    camera: Camera,
    depth_map: Optional[jax.Array] = None,
    depth_tolerance: float = 0.05,
    threshold: float = 0.5,
) -> jax.Array:
    """Bilinearly sample a 2D mask at projected 3D points, returning a
    (N,) bool in-mask flag. With depth_map, points occluded by nearer
    geometry (z > depth + tolerance) are excluded (the reference's
    depth-consistency test, `point_utils.py:76-111`)."""
    H, W = mask.shape
    m = mask.astype(jnp.float32)
    uv, z = project_pcd(points, camera)
    u, v = uv[:, 0], uv[:, 1]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0

    def at(vi, ui):
        inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        return jnp.where(inb, m[vi.clip(0, H - 1), ui.clip(0, W - 1)], 0.0)

    val = ((1 - fu) * (1 - fv) * at(v0, u0) + fu * (1 - fv) * at(v0, u0 + 1)
           + (1 - fu) * fv * at(v0 + 1, u0) + fu * fv * at(v0 + 1, u0 + 1))
    ok = (val > threshold) & (z > 1e-9)
    if depth_map is not None:
        ui = jnp.round(u).astype(jnp.int32).clip(0, W - 1)
        vi = jnp.round(v).astype(jnp.int32).clip(0, H - 1)
        ok = ok & (z <= depth_map[vi, ui] + depth_tolerance)
    return ok
