"""Real spherical-harmonics color evaluation, degrees 0..3.

Matches the standard 3DGS convention (the role gsplat's SH kernel plays
for the reference, SURVEY.md §2.2): color = max(0, SH(dir) + 0.5), with
the hard-coded real-SH basis constants.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(degree: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH color.

    Args:
      degree: active SH degree (0..3); bases beyond it are ignored.
      sh: (..., K, 3) coefficients with K >= (degree+1)^2 (extra ignored).
      dirs: (..., 3) unit view directions (world frame, camera->gaussian).

    Returns:
      (..., 3) RGB, clamped to >= 0 after the +0.5 offset.
    """
    res = C0 * sh[..., 0, :]
    if degree >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        res = res - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        res = (res
               + C2[0] * xy * sh[..., 4, :]
               + C2[1] * yz * sh[..., 5, :]
               + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
               + C2[3] * xz * sh[..., 7, :]
               + C2[4] * (xx - yy) * sh[..., 8, :])
    if degree >= 3:
        res = (res
               + C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
               + C3[1] * xy * z * sh[..., 10, :]
               + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
               + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
               + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
               + C3[5] * z * (xx - yy) * sh[..., 14, :]
               + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :])
    return jnp.maximum(res + 0.5, 0.0)
