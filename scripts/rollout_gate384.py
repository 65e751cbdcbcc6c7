import os, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from wedgeguard import start_wedge_guard
_pet = start_wedge_guard()

import jax, jax.numpy as jnp, numpy as np
jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
_pet()
from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import project
from robosimgs_tpu.render.tiled import composite_tiled
from robosimgs_tpu.train.losses import psnr

attempt = 16 * max(int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0) - 1, 0)
n = 200_000 + attempt
g = Gaussians.random(jax.random.PRNGKey(2), n, sh_degree=2, extent=1.5)
cam = Camera.look_at([3.0, 0.4, 1.0], [0, 0, 0], [0, 0, 1], 60.0, 640, 480)

def render(k, chunk):
    c = RenderConfig(tile_capacity=k, tile_chunk=chunk,
                     max_tiles_per_gaussian=64, bbox_tiles_per_gaussian=84)
    r = jax.jit(lambda: composite_tiled(project(g, cam, c), 640, 480, c)["rgb"])()
    jax.block_until_ready(r); _pet()
    return r

ref = render(8192, 512)
r384 = render(384, 0)
print(f"GATE K=384 (m=64) vs K=8192: {float(psnr(r384, ref)):.1f} dB", flush=True)
