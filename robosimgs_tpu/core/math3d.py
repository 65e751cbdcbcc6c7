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


def rotmat_components(q):
    """Unit quats (...,4) -> rotation matrix as a 3x3 nested tuple of
    (...,) arrays. Keeps batched 3x3 algebra elementwise on the VPU —
    (N,3,3) arrays put the 3-wide dims on 128-wide lanes (42x padding
    waste) and route through MXU passes."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
        (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
        (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)),
    )


def camera_covariance_components(quats, scales, R_cw):
    """Upper-triangular entries of Rcw (R S S^T R^T) Rcw^T, elementwise.

    quats (...,4) unit, scales (...,3), R_cw static (3,3). Returns
    (c00, c01, c02, c11, c12, c22), each (...,). This is the covariance
    path of EWA projection with every contraction unrolled to (...,)
    elementwise math — exact f32, no MXU, no (N,3,3) layouts.
    """
    R = rotmat_components(quats)
    # M = R_cw @ R  (3x3 of (...,) arrays; R_cw entries are scalars)
    M = [[sum(R_cw[i, k] * R[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]
    s0, s1, s2 = scales[..., 0], scales[..., 1], scales[..., 2]
    sq = (s0 * s0, s1 * s1, s2 * s2)

    def cov(i, j):
        return (M[i][0] * M[j][0] * sq[0] + M[i][1] * M[j][1] * sq[1]
                + M[i][2] * M[j][2] * sq[2])

    return cov(0, 0), cov(0, 1), cov(0, 2), cov(1, 1), cov(1, 2), cov(2, 2)


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
