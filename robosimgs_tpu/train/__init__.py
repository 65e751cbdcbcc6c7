from robosimgs_tpu.train.losses import l1_loss, psnr, ssim
from robosimgs_tpu.train.trainer import TrainConfig, Trainer

__all__ = ["l1_loss", "psnr", "ssim", "TrainConfig", "Trainer"]
