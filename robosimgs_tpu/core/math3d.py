"""Quaternion / rotation / covariance math (batched, autodiff-friendly)."""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q):
    """(..., 4) (w,x,y,z) unit quaternions -> (..., 3, 3) rotation matrices."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [jnp.stack([r00, r01, r02], -1),
         jnp.stack([r10, r11, r12], -1),
         jnp.stack([r20, r21, r22], -1)], -2)


def quat_multiply(a, b):
    """Hamilton product of (w,x,y,z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def axis_angle_to_quat(axis, angle):
    """(...,3) unit axis + (...) angle -> (w,x,y,z) quaternion."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def build_covariance(quats, scales):
    """Sigma = R S S^T R^T from unit quats (...,4) and scales (...,3).

    Returns (..., 3, 3) symmetric PSD covariance. This is the 3DGS
    parameterization (role of the reference's delegated gsplat core,
    SURVEY.md §2.2). Full-f32 contraction: the TPU default would route
    these tiny matmuls through bf16 MXU passes and visibly perturb the
    projected covariances.
    """
    R = quat_to_rotmat(quats)
    RS = R * scales[..., None, :]         # R @ diag(s)
    return jnp.einsum("...ij,...kj->...ik", RS, RS, precision="highest")


def transform_points(T, pts):
    """Apply (...,4,4) rigid transform to (...,N,3) points."""
    return pts @ jnp.swapaxes(T[..., :3, :3], -1, -2) + T[..., None, :3, 3]


def inverse_2x2_sym(a, b, c, eps=0.0):
    """Inverse of the symmetric 2x2 [[a,b],[b,c]]; returns (ia, ib, ic, det)."""
    det = a * c - b * b
    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    return c * inv_det, -b * inv_det, a * inv_det, det
