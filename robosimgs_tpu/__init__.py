"""robosimgs_tpu — a TPU-native Real2Sim2Real framework.

A from-scratch JAX/XLA/Pallas framework providing the capabilities of
RoboSimGS (reference: Maxwell-Zhao/RoboSimGS): differentiable 3D Gaussian
Splatting reconstruction and training, photoreal multi-camera rollout
rendering (background splats composited with sim-posed object meshes),
and the articulated-object toolchain (part segmentation, hinge detection,
URDF generation, physics-parameter estimation).

Layering (see SURVEY.md §7):
  core/      — Gaussian pytrees, cameras, quaternion/covariance/SH math
  render/    — jnp reference rasterizer, Pallas TPU kernels, mesh raster
  train/     — losses, optimizer, densification, trainer, datasets
  parallel/  — device meshes, sharded rasterization/training (pjit/shard_map)
  scenegen/  — URDF FK playback + multi-camera rollout rendering
  artic/     — articulation + physics-estimation toolchain
  cli/       — entry points
"""

__version__ = "0.1.0"

from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.core.camera import Camera

__all__ = ["Gaussians", "Camera", "__version__"]
