from robosimgs_tpu.scenegen.urdf_fk import URDFModel
from robosimgs_tpu.scenegen.rollout import ArticulatedObject, render_rollout

__all__ = ["URDFModel", "ArticulatedObject", "render_rollout"]
