from robosimgs_tpu.policy.diffusion import (DiffusionPolicy,
                                            DiffusionPolicyConfig)
from robosimgs_tpu.policy.inference import ActionChunker
from robosimgs_tpu.policy.trainer import PolicyTrainer, PolicyTrainConfig

__all__ = ["DiffusionPolicy", "DiffusionPolicyConfig", "PolicyTrainer",
           "PolicyTrainConfig", "ActionChunker"]
