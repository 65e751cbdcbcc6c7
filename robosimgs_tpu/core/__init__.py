from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.core.camera import Camera

__all__ = ["Gaussians", "Camera"]
