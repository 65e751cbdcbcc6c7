from robosimgs_tpu.artic.hinge import HingeDetector, HingeResult
from robosimgs_tpu.artic.urdf_builder import URDFBuilder
from robosimgs_tpu.artic.pipeline import ArticulationPipeline

__all__ = ["HingeDetector", "HingeResult", "URDFBuilder", "ArticulationPipeline"]
