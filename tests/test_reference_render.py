import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import project
from robosimgs_tpu.render.rasterize import rasterize


def make_camera(w=64, h=64, dist=4.0):
    return Camera.look_at([dist, 0.0, 0.0], [0, 0, 0], [0, 0, 1], 60.0, w, h)


def make_scene(n=200, seed=0, extent=1.0):
    return Gaussians.random(jax.random.PRNGKey(seed), n, sh_degree=1, extent=extent)


def naive_render(g: Gaussians, cam: Camera, cfg: RenderConfig, bg=None):
    """Straight-line numpy implementation of the documented semantics."""
    proj = jax.device_get(project(g, cam, cfg))
    order = np.argsort(np.where(proj.valid, proj.depths, np.inf), kind="stable")
    H, W = cam.height, cam.width
    ts = cfg.tile_size
    img = np.zeros((H, W, 3))
    acc = np.zeros((H, W))
    for yy in range(H):
        for xx in range(W):
            T = 1.0
            for i in order:
                if not proj.valid[i] or proj.radii[i] <= 0:
                    continue
                u, v = proj.means2d[i]
                r = proj.radii[i]
                tx0 = min(max(int(np.floor((u - r) / ts)), 0), (W + ts - 1) // ts - 1)
                tx1 = min(max(int(np.floor((u + r) / ts)), 0), (W + ts - 1) // ts - 1)
                ty0 = min(max(int(np.floor((v - r) / ts)), 0), (H + ts - 1) // ts - 1)
                ty1 = min(max(int(np.floor((v + r) / ts)), 0), (H + ts - 1) // ts - 1)
                if not (tx0 <= xx // ts <= tx1 and ty0 <= yy // ts <= ty1):
                    continue
                dx, dy = xx - u, yy - v
                a, b, c = proj.conics[i]
                q = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                if q < 0:
                    continue
                alpha = min(cfg.alpha_clamp, proj.opacities[i] * np.exp(-q))
                if alpha < cfg.alpha_min:
                    continue
                t_after = T * (1 - alpha)
                if t_after < cfg.transmittance_min:
                    break
                img[yy, xx] += alpha * T * proj.colors[i]
                acc[yy, xx] += alpha * T
                T = t_after
    if bg is not None:
        img += (1 - acc)[..., None] * np.asarray(bg)
    return img, acc


def test_reference_matches_naive_small():
    cfg = RenderConfig(ref_gaussian_chunk=64)
    cam = make_camera(32, 32)
    g = make_scene(n=60, seed=3)
    out = rasterize(g, cam, cfg, impl="reference")
    img_naive, acc_naive = naive_render(g, cam, cfg)
    np.testing.assert_allclose(np.asarray(out["rgb"]), img_naive, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["alpha"]), acc_naive, atol=2e-5)


def test_reference_background_blend():
    cfg = RenderConfig()
    cam = make_camera(32, 32)
    g = make_scene(n=20, seed=1)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    out = rasterize(g, cam, cfg, background=bg, impl="reference")
    # empty corner pixels equal background
    alpha = np.asarray(out["alpha"])
    rgb = np.asarray(out["rgb"])
    empty = alpha < 1e-6
    assert empty.any()
    np.testing.assert_allclose(rgb[empty], np.broadcast_to([0.2, 0.4, 0.6], rgb[empty].shape), atol=1e-5)


def test_reference_empty_scene():
    cam = make_camera(16, 16)
    g = make_scene(n=8)
    g = g.replace(alive=jnp.zeros_like(g.alive))
    out = rasterize(g, cam, impl="reference")
    assert np.allclose(np.asarray(out["rgb"]), 0)
    assert np.allclose(np.asarray(out["alpha"]), 0)


def test_reference_opaque_front_occludes():
    # one big opaque gaussian in front of another; back one contributes ~0
    means = np.array([[0, 0, 0], [0.5, 0, 0]], np.float32)  # cam at +x: second is closer
    g = Gaussians.from_points(means, np.array([[1, 0, 0], [0, 1, 0]], np.float32),
                              sh_degree=0, init_scale=np.array([0.4, 0.4], np.float32))
    g = g.replace(logit_opacities=jnp.full((2,), 12.0))  # opacity ~1 (clamped 0.99)
    cam = make_camera(32, 32)
    out = rasterize(g, cam, impl="reference")
    center = np.asarray(out["rgb"])[16, 16]
    # front gaussian (at +0.5, closer to the camera at +4x) is green
    assert center[1] > 0.5 and center[0] < 0.1


def test_reference_differentiable():
    cfg = RenderConfig(ref_gaussian_chunk=32)
    cam = make_camera(24, 24)
    g = make_scene(n=30, seed=5)
    target = jnp.zeros((24, 24, 3))

    def loss(means):
        out = rasterize(g.replace(means=means), cam, cfg, impl="reference")
        return jnp.mean((out["rgb"] - target) ** 2)

    val, grad = jax.value_and_grad(loss)(g.means)
    assert np.isfinite(float(val))
    grad = np.asarray(grad)
    assert np.isfinite(grad).all()
    assert np.abs(grad).max() > 0


def test_reference_finite_difference_grad():
    """Check autodiff gradient of the full render against finite differences."""
    cfg = RenderConfig(ref_gaussian_chunk=16)
    cam = make_camera(16, 16, dist=3.0)
    g = make_scene(n=10, seed=7, extent=0.6)
    target = jnp.full((16, 16, 3), 0.3)

    def loss(lo):
        out = rasterize(g.replace(logit_opacities=lo), cam, cfg, impl="reference")
        return jnp.mean((out["rgb"] - target) ** 2)

    lo0 = g.logit_opacities
    grad = np.asarray(jax.grad(loss)(lo0))
    eps = 1e-3
    for i in [0, 3, 7]:
        e = jnp.zeros_like(lo0).at[i].set(eps)
        fd = (float(loss(lo0 + e)) - float(loss(lo0 - e))) / (2 * eps)
        np.testing.assert_allclose(grad[i], fd, rtol=0.12, atol=2e-6)


@pytest.mark.parametrize("wh", [(33, 17), (64, 48)])
def test_reference_nonmultiple_resolutions(wh):
    w, h = wh
    cam = make_camera(w, h)
    g = make_scene(n=50, seed=2)
    out = rasterize(g, cam, impl="reference")
    assert out["rgb"].shape == (h, w, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
