"""Per-Gaussian projection: world 3D Gaussians -> screen-space splats.

This is the EWA projection stage of the 3DGS rasterizer (the part of the
reference's delegated gsplat core that runs one thread per Gaussian,
SURVEY.md §3.4): camera transform, perspective Jacobian with FOV-limit
clamping, 2D covariance + low-pass blur, conic inversion, radius/culling,
and SH color evaluation. Pure jnp — O(N) elementwise work that XLA fuses
well on the VPU; autodiff supplies the exact backward, so only the O(N*P)
compositing stage (render/pallas) needs a hand-written VJP.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.math3d import camera_covariance_components
from robosimgs_tpu.core.sh import eval_sh
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.config import RenderConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Projected:
    """Screen-space splats, one slot per Gaussian (capacity-static).

    means2d: (N, 2) pixel coords (pixel centers at integer coordinates).
    conics:  (N, 3) (a, b, c) of the inverse 2D covariance.
    depths:  (N,)   camera-space z.
    radii:   (N,)   float pixel radius (0 where culled).
    colors:  (N, 3) SH-evaluated RGB.
    opacities: (N,) activated opacity.
    valid:   (N,)   bool — alive, in front of camera, invertible, on screen.
    """

    means2d: jax.Array
    conics: jax.Array
    depths: jax.Array
    radii: jax.Array
    colors: jax.Array
    opacities: jax.Array
    valid: jax.Array
    # optional (N, 2) zeros probe whose GRADIENT carries the absgrad
    # densification signal (sum over pixels of |dL/dmean2d|) when
    # RenderConfig.absgrad is on — rides pack16 columns 7/15 through
    # the binning transpose (see pallas_kernels._bwd_kernel)
    abs_probe: Optional[jax.Array] = None
    # optional (N, 3) camera-space unit splat normals (the rotated
    # minimum-scale axis, oriented toward the camera) when
    # RenderConfig.render_normals is on — composited alpha-weighted
    # into the "normal" output map via pack16 rows 13/14(/15)
    normals: Optional[jax.Array] = None


def project(
    gaussians: Gaussians,
    camera: Camera,
    cfg: RenderConfig = RenderConfig(),
    sh_degree: int | None = None,
    means2d_offset: jax.Array | None = None,
    tan_half_fov: tuple | None = None,
    abs_probe: jax.Array | None = None,
) -> Projected:
    """means2d_offset: optional (N, 2) zeros whose gradient exposes the
    per-Gaussian screen-space gradient (the densification signal the
    reference's gsplat trainer reads from its CUDA kernel).

    tan_half_fov: optional (tan_fx, tan_fy) override for the Jacobian
    clamping limits — tile-sharded rendering passes the FULL frame's
    FOV here so a row-strip crop camera projects identically to the
    uncropped one."""
    g = gaussians
    if sh_degree is None:
        sh_degree = g.sh_degree

    w2c = camera.w2c
    R_cw = w2c[:3, :3]
    t_cw = w2c[:3, 3]

    # Camera transform + covariance rotation unrolled to (N,) elementwise
    # math: exact f32 (TPU's default bf16 MXU passes shift projected
    # centers ~0.3px and break cross-backend parity) AND fast — batched
    # (N,3)/(N,3,3) contractions put 3-wide dims on 128-wide lanes.
    mx, my, mz = g.means[:, 0], g.means[:, 1], g.means[:, 2]
    tx = R_cw[0, 0] * mx + R_cw[0, 1] * my + R_cw[0, 2] * mz + t_cw[0]
    ty = R_cw[1, 0] * mx + R_cw[1, 1] * my + R_cw[1, 2] * mz + t_cw[1]
    tz = R_cw[2, 0] * mx + R_cw[2, 1] * my + R_cw[2, 2] * mz + t_cw[2]
    t = jnp.stack([tx, ty, tz], -1)
    in_front = tz > cfg.near
    tz_safe = jnp.where(in_front, tz, 1.0)

    # 3D covariance rotated into the camera frame (component form).
    c00_, c01_, c02_, c11_, c12_, c22_ = camera_covariance_components(
        g.normalized_quats(), g.scales(), R_cw)

    # Perspective Jacobian with the reference's 1.3x-FOV clamping of the
    # projected center (stabilizes far-off-screen Gaussians).
    tan_fx, tan_fy = tan_half_fov if tan_half_fov is not None else camera.tan_half_fov
    lim_x = 1.3 * tan_fx
    lim_y = 1.3 * tan_fy
    txz = jnp.clip(t[:, 0] / tz_safe, -lim_x, lim_x)
    tyz = jnp.clip(t[:, 1] / tz_safe, -lim_y, lim_y)
    fx, fy = camera.fx, camera.fy
    inv_z = 1.0 / tz_safe
    # J = [[fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]]  (rows of 2x3)
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z

    c00, c01, c02 = c00_, c01_, c02_
    c11, c12, c22 = c11_, c12_, c22_
    # cov2d = J C J^T (expanded; J sparse with zeros at j01/j10)
    a_raw = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c_raw = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)
    a = a_raw + cfg.blur
    c = c_raw + cfg.blur

    det = a * c - b * b
    invertible = det > 0.0
    det_safe = jnp.where(invertible, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], -1)

    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(cfg.radius_factor * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    u = fx * t[:, 0] * inv_z + camera.cx - 0.5
    v = fy * t[:, 1] * inv_z + camera.cy - 0.5
    means2d = jnp.stack([u, v], -1)
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    on_screen = (
        (u + radius > 0.0) & (u - radius < camera.width - 1)
        & (v + radius > 0.0) & (v - radius < camera.height - 1)
    )
    valid = g.alive & in_front & invertible & on_screen
    radius = jnp.where(valid, radius, 0.0)

    # SH color in the world frame from the camera origin.
    dirs = g.means - camera.origin
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-8)
    sh = jnp.concatenate([g.sh_dc[:, None, :], g.sh_rest], axis=1)
    colors = eval_sh(sh_degree, sh, dirs)

    normals = None
    if cfg.render_normals:
        # splat normal = rotated axis of the SMALLEST scale (the flat
        # direction), camera-space, oriented toward the camera. The
        # one-hot axis pick is piecewise-constant in scales (no grad
        # through argmin — standard 2DGS/gsplat semantics); gradients
        # flow to the quats through the rotation components.
        from robosimgs_tpu.core.math3d import rotmat_components
        rc = rotmat_components(g.normalized_quats())
        s = g.scales()
        oh = jax.nn.one_hot(jnp.argmin(s, axis=-1), 3,
                            dtype=jnp.float32)               # (N, 3)
        nwx = rc[0][0] * oh[:, 0] + rc[0][1] * oh[:, 1] + rc[0][2] * oh[:, 2]
        nwy = rc[1][0] * oh[:, 0] + rc[1][1] * oh[:, 1] + rc[1][2] * oh[:, 2]
        nwz = rc[2][0] * oh[:, 0] + rc[2][1] * oh[:, 1] + rc[2][2] * oh[:, 2]
        ncx = R_cw[0, 0] * nwx + R_cw[0, 1] * nwy + R_cw[0, 2] * nwz
        ncy = R_cw[1, 0] * nwx + R_cw[1, 1] * nwy + R_cw[1, 2] * nwz
        ncz = R_cw[2, 0] * nwx + R_cw[2, 1] * nwy + R_cw[2, 2] * nwz
        flip = jnp.where(ncx * tx + ncy * ty + ncz * tz > 0.0, -1.0, 1.0)
        normals = jnp.stack([ncx, ncy, ncz], -1) * flip[:, None]

    opacities = g.opacities()
    if cfg.antialiased:
        # mip-splatting opacity compensation: the +blur low-pass
        # enlarges splats; scaling opacity by sqrt(det_raw/det_blurred)
        # keeps their integrated contribution constant
        det_raw = a_raw * c_raw - b * b
        comp = jnp.sqrt(jnp.maximum(det_raw, 0.0)
                        / jnp.where(det_safe > 0, det_safe, 1.0))
        opacities = opacities * comp

    return Projected(
        means2d=means2d,
        conics=conic,
        depths=tz,
        radii=radius,
        colors=colors,
        opacities=opacities,
        valid=valid,
        abs_probe=abs_probe,
        normals=normals,
    )
