"""Gaussian-splat parameter pytree.

The canonical trainable state of a 3DGS scene. Parameters are stored in
unconstrained form (log-scales, logit-opacities, unnormalized quaternions)
so that plain gradient steps stay in-range; the activated values are
computed at projection time.

Capacity model (TPU-friendly): the arrays are allocated at a fixed
capacity ``N`` and an ``alive`` mask marks which slots are live. Densify/
prune (train/densify.py) moves Gaussians between slots without changing
array shapes, so every jitted function sees static shapes.

Role in the reference pipeline: this is the scene representation that
RoboSimGS delegates to Nerfstudio/gsplat (`/root/reference/README.md:73-75`);
the PLY layout in io_ply.py matches the standard 3DGS export so scenes are
interchangeable with reference-trained ones.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Gaussians:
    """A (capacity-N) set of 3D Gaussians.

    Attributes:
      means:       (N, 3) world-space centers.
      quats:       (N, 4) rotations, (w, x, y, z); normalized at use site.
      log_scales:  (N, 3) per-axis log standard deviations.
      logit_opacities: (N,) opacity in logit space; sigmoid at use site.
      sh_dc:       (N, 3) degree-0 SH coefficients (DC color term).
      sh_rest:     (N, K-1, 3) higher-degree SH coefficients, K = (deg+1)^2.
      alive:       (N,) bool mask of live slots.
    """

    means: jax.Array
    quats: jax.Array
    log_scales: jax.Array
    logit_opacities: jax.Array
    sh_dc: jax.Array
    sh_rest: jax.Array
    alive: jax.Array

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        k = 1 + self.sh_rest.shape[1]
        return int(round(k**0.5)) - 1

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    # -- activated views ---------------------------------------------------

    def scales(self) -> jax.Array:
        return jnp.exp(self.log_scales)

    def opacities(self) -> jax.Array:
        return jax.nn.sigmoid(self.logit_opacities)

    def normalized_quats(self) -> jax.Array:
        return self.quats / jnp.linalg.norm(self.quats, axis=-1, keepdims=True).clip(1e-12)

    # -- constructors ------------------------------------------------------

    @staticmethod
    def from_points(
        points: np.ndarray,
        colors: Optional[np.ndarray] = None,
        sh_degree: int = 3,
        capacity: Optional[int] = None,
        init_opacity: float = 0.1,
        init_scale: Optional[np.ndarray] = None,
    ) -> "Gaussians":
        """Initialize from a point cloud (e.g. SfM points or mesh samples).

        Scales default to the log of the mean distance to the 3 nearest
        neighbors (isotropic), the standard 3DGS initialization.
        """
        points = np.asarray(points, np.float32)
        n = points.shape[0]
        cap = capacity or n
        if cap < n:
            raise ValueError(f"capacity {cap} < n points {n}")
        k = (sh_degree + 1) ** 2

        means = np.zeros((cap, 3), np.float32)
        means[:n] = points
        quats = np.zeros((cap, 4), np.float32)
        quats[:, 0] = 1.0
        if init_scale is None:
            from robosimgs_tpu.native import knn_mean_dist
            init_scale = knn_mean_dist(points, k=3)
        init_scale = np.broadcast_to(np.asarray(init_scale, np.float32).reshape(-1, 1), (n, 3))
        log_scales = np.full((cap, 3), -5.0, np.float32)
        log_scales[:n] = np.log(np.clip(init_scale, 1e-7, None))
        logit_op = np.full((cap,), _logit(init_opacity), np.float32)
        sh_dc = np.zeros((cap, 3), np.float32)
        if colors is not None:
            sh_dc[:n] = rgb_to_sh(np.asarray(colors, np.float32))
        sh_rest = np.zeros((cap, k - 1, 3), np.float32)
        alive = np.zeros((cap,), bool)
        alive[:n] = True
        return Gaussians(
            means=jnp.asarray(means),
            quats=jnp.asarray(quats),
            log_scales=jnp.asarray(log_scales),
            logit_opacities=jnp.asarray(logit_op),
            sh_dc=jnp.asarray(sh_dc),
            sh_rest=jnp.asarray(sh_rest),
            alive=jnp.asarray(alive),
        )

    @staticmethod
    def random(
        key: jax.Array,
        n: int,
        sh_degree: int = 3,
        extent: float = 1.0,
        capacity: Optional[int] = None,
    ) -> "Gaussians":
        """Random scene for tests/benchmarks."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        pts = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
        cols = jax.random.uniform(k2, (n, 3), minval=0.1, maxval=0.9)
        g = Gaussians.from_points(
            np.asarray(pts), np.asarray(cols), sh_degree=sh_degree, capacity=capacity,
            init_scale=np.full((n,), 0.03 * extent, np.float32),
        )
        quats = jax.random.normal(k3, (g.capacity, 4)) * 0.1
        quats = quats.at[:, 0].add(1.0)
        lo = jax.random.uniform(k4, (g.capacity,), minval=-1.0, maxval=2.0)
        return dataclasses.replace(g, quats=quats, logit_opacities=lo)

    def replace(self, **kw) -> "Gaussians":
        return dataclasses.replace(self, **kw)


def _logit(p: float) -> float:
    return float(np.log(p / (1.0 - p)))


def _knn_mean_dist(points: np.ndarray, k: int = 3, chunk: int = 4096) -> np.ndarray:
    """Mean distance to k nearest neighbors (excluding self), chunked O(N^2)."""
    n = points.shape[0]
    if n <= 1:
        return np.full((n,), 0.01, np.float32)
    out = np.empty((n,), np.float32)
    kk = min(k, n - 1)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        d2 = ((points[s:e, None, :] - points[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2[:, s:e], np.inf) if e - s == n else None
        for i in range(s, e):
            d2[i - s, i] = np.inf
        part = np.partition(d2, kk - 1, axis=1)[:, :kk]
        out[s:e] = np.sqrt(np.maximum(part, 1e-12)).mean(1)
    return np.clip(out, 1e-7, None)


SH_C0 = 0.28209479177387814  # Y_00


def rgb_to_sh(rgb: np.ndarray) -> np.ndarray:
    """Convert [0,1] RGB to the DC SH coefficient (3DGS convention)."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh0) :
    return sh0 * SH_C0 + 0.5
