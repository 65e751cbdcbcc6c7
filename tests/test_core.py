import jax
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.math3d import (axis_angle_to_quat, build_covariance,
                                       quat_multiply, quat_to_rotmat)
from robosimgs_tpu.core.sh import C0, eval_sh
from robosimgs_tpu.core.types import Gaussians


def test_quat_to_rotmat_identity():
    q = jnp.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(quat_to_rotmat(q), np.eye(3), atol=1e-6)


def test_quat_to_rotmat_orthonormal(rng):
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_quat_axis_angle_roundtrip():
    axis = np.array([0.0, 0.0, 1.0], np.float32)
    q = axis_angle_to_quat(jnp.asarray(axis), jnp.float32(np.pi / 2))
    R = np.asarray(quat_to_rotmat(q))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_multiply_composition(rng):
    a = rng.normal(size=(4,)).astype(np.float32)
    b = rng.normal(size=(4,)).astype(np.float32)
    a /= np.linalg.norm(a)
    b /= np.linalg.norm(b)
    Rab = np.asarray(quat_to_rotmat(quat_multiply(jnp.asarray(a), jnp.asarray(b))))
    Ra = np.asarray(quat_to_rotmat(jnp.asarray(a)))
    Rb = np.asarray(quat_to_rotmat(jnp.asarray(b)))
    np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)


def test_build_covariance_psd(rng):
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng.normal(size=(16, 3)).astype(np.float32))
    cov = np.asarray(build_covariance(jnp.asarray(q), jnp.asarray(s)))
    np.testing.assert_allclose(cov, cov.transpose(0, 2, 1), atol=1e-5)
    eig = np.linalg.eigvalsh(cov)
    assert (eig > -1e-5).all()
    # eigenvalues are the squared scales
    np.testing.assert_allclose(np.sort(eig, 1), np.sort(s**2, 1), rtol=1e-2)


def test_camera_w2c_inverse():
    cam = Camera.look_at([1.0, 2.0, 3.0], [0, 0, 0], [0, 0, 1], 60.0, 64, 48)
    M = np.asarray(cam.c2w) @ np.asarray(cam.w2c)
    np.testing.assert_allclose(M, np.eye(4), atol=1e-5)


def test_camera_look_at_centers_target():
    cam = Camera.look_at([2.0, -1.0, 0.5], [0.1, 0.2, 0.3], [0, 0, 1], 60.0, 100, 80)
    w2c = np.asarray(cam.w2c)
    t = w2c[:3, :3] @ np.array([0.1, 0.2, 0.3]) + w2c[:3, 3]
    assert t[2] > 0  # in front (OpenCV +z)
    u = float(cam.fx) * t[0] / t[2] + float(cam.cx)
    v = float(cam.fy) * t[1] / t[2] + float(cam.cy)
    np.testing.assert_allclose([u, v], [50.0, 40.0], atol=1e-3)


def test_camera_opengl_conversion():
    # An OpenGL camera at origin looking down -z == OpenCV looking down +z.
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    cam = Camera.from_opengl(K, np.eye(4), 64, 64)
    w2c = np.asarray(cam.w2c)
    p = w2c[:3, :3] @ np.array([0.0, 0.0, -2.0]) + w2c[:3, 3]
    np.testing.assert_allclose(p, [0, 0, 2.0], atol=1e-6)


def test_sh_degree0_constant():
    sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)).astype(np.float32))
    dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = eval_sh(3, sh, dirs)
    np.testing.assert_allclose(out, np.full((5, 3), C0 + 0.5), atol=1e-6)


def test_sh_clamped_nonnegative(rng):
    sh = jnp.asarray(rng.normal(size=(10, 16, 3)).astype(np.float32) * 5)
    dirs = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    assert (np.asarray(eval_sh(3, sh, dirs)) >= 0).all()


def test_gaussians_from_points():
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(size=(100, 3)).astype(np.float32)
    g = Gaussians.from_points(pts, cols, sh_degree=2, capacity=128)
    assert g.capacity == 128
    assert g.sh_degree == 2
    assert int(g.num_alive) == 100
    assert np.asarray(g.alive)[100:].sum() == 0
    np.testing.assert_allclose(np.asarray(g.means[:100]), pts, atol=1e-6)
    # scales positive and finite
    s = np.asarray(g.scales())
    assert np.isfinite(s).all() and (s > 0).all()


def test_gaussians_pytree_roundtrip():
    g = Gaussians.random(jax.random.PRNGKey(0), 50, sh_degree=1)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(np.asarray(g2.means), np.asarray(g.means))
