from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.rasterize import rasterize

__all__ = ["RenderConfig", "rasterize"]
