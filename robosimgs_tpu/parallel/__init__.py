from robosimgs_tpu.parallel.mesh import make_mesh
from robosimgs_tpu.parallel.distributed import (make_dp_train_step,
                                                stack_cameras)

__all__ = ["make_mesh", "make_dp_train_step", "stack_cameras"]
