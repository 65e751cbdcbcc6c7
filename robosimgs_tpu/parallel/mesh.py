"""Device meshes and axis conventions.

Axes (SURVEY.md §2.3 mapping of classic strategies onto this workload):
  data — cameras / rollout batch (DP); gradient all-reduce rides this axis.
  tile — image tiles of one frame (the SP/CP analog); Gaussians are
         replicated (small scenes) or ring-streamed (large) across it.

Multi-host: put the DCN-connected axis outermost ('data'), ICI inside
('tile'), per the standard pod-slice recipe.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: Optional[int] = None, n_tile: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_tile
    assert n_data * n_tile <= len(devices), (n_data, n_tile, len(devices))
    arr = np.asarray(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(arr, ("data", "tile"))


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (DCN): the XLA-runtime replacement for the
    NCCL/torch.distributed init the reference stack would use
    (SURVEY.md §5.8). No-op if already initialized or single-process."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
