"""Public rasterization API.

rasterize(gaussians, camera) -> {rgb, alpha, depth}

impl:
  "reference" — pure-jnp exact path (CPU-friendly, autodiff backward)
  "tiled"     — tile-binned XLA+Pallas path (TPU; custom VJP)
  "auto"      — "tiled" on TPU backends, else "reference"
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import project
from robosimgs_tpu.render.reference import composite_reference


def rasterize(
    gaussians: Gaussians,
    camera: Camera,
    cfg: RenderConfig = RenderConfig(),
    sh_degree: Optional[int] = None,
    background: Optional[jax.Array] = None,
    impl: str = "auto",
) -> Dict[str, jax.Array]:
    if impl == "auto":
        backend = jax.default_backend()
        impl = "reference" if backend == "cpu" else "tiled"

    proj = project(gaussians, camera, cfg, sh_degree=sh_degree)
    if impl == "reference":
        return composite_reference(proj, camera.width, camera.height, cfg, background)
    elif impl == "tiled":
        from robosimgs_tpu.render.tiled import composite_tiled
        return composite_tiled(proj, camera.width, camera.height, cfg, background)
    raise ValueError(f"unknown impl {impl!r}")
