import gzip
import io

import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.utils.nerfstudio import (depth_to_distance,
                                            distance_to_depth,
                                            load_depth_npy_gz, scene_splits,
                                            unproject_pixel)
from robosimgs_tpu.utils.pointcloud import (depth_map_from_points,
                                            project_pcd,
                                            sample_mask_at_points,
                                            unproject_pcd)


def make_cam(w=64, h=48):
    return Camera.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0], 60.0, w, h)


def test_project_unproject_roundtrip(rng):
    cam = make_cam()
    pts = rng.uniform(-0.5, 0.5, (100, 3)).astype(np.float32)
    uv, z = project_pcd(jnp.asarray(pts), cam)
    back = unproject_pcd(uv, z, cam)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_depth_map_from_points():
    cam = make_cam(32, 32)
    # two points on the optical axis; nearer one wins the z-buffer
    pts = jnp.asarray(np.array([[0, 0, 0], [0, 0, -1.0]], np.float32))
    d = np.asarray(depth_map_from_points(pts, cam, downscale=1))
    uv, z = project_pcd(pts, cam)
    u, v = np.round(np.asarray(uv[1])).astype(int)
    assert np.isfinite(d[v, u])
    np.testing.assert_allclose(d[v, u], float(z[1]), atol=1e-5)  # nearer point
    assert np.isinf(d[0, 0])


def test_sample_mask_at_points():
    cam = make_cam(32, 32)
    mask = np.zeros((32, 32), np.float32)
    mask[:, :16] = 1.0   # left half of image
    pts = np.array([[-0.5, 0, 0], [0.5, 0, 0]], np.float32)
    flags = np.asarray(sample_mask_at_points(jnp.asarray(mask),
                                             jnp.asarray(pts), cam))
    # camera right = cross(fwd=+z, up=+y) = -x, so world +0.5x is image-left
    assert flags.tolist() == [False, True]


def test_sample_mask_depth_consistency():
    cam = make_cam(32, 32)
    mask = np.ones((32, 32), np.float32)
    pts = jnp.asarray(np.array([[0, 0, 0], [0, 0, 1.0]], np.float32))
    # depth map from the nearer point only -> the farther is occluded
    dm = depth_map_from_points(pts[:1], cam, downscale=1)
    dm = jnp.where(jnp.isinf(dm), 3.0, dm)  # fill empty with the near depth
    flags = np.asarray(sample_mask_at_points(jnp.asarray(mask), pts, cam,
                                             depth_map=dm))
    assert flags.tolist() == [True, False]


def test_depth_distance_roundtrip():
    cam = make_cam(16, 16)
    depth = np.random.default_rng(0).uniform(1, 5, (16, 16)).astype(np.float32)
    dist = depth_to_distance(depth, cam)
    assert (dist >= depth - 1e-5).all()   # ray length >= 1
    np.testing.assert_allclose(distance_to_depth(dist, cam), depth, rtol=1e-5)


def test_unproject_pixel_consistent_with_pcd():
    cam = make_cam()
    p = unproject_pixel(20.0, 10.0, 2.5, cam)
    uv, z = project_pcd(jnp.asarray(p[None]), cam)
    np.testing.assert_allclose(np.asarray(uv[0]), [20.0, 10.0], atol=1e-3)
    np.testing.assert_allclose(float(z[0]), 2.5, atol=1e-5)


def test_load_depth_npy_gz(tmp_path):
    arr = np.random.default_rng(0).uniform(size=(8, 6)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, arr)
    p = tmp_path / "d.npy.gz"
    p.write_bytes(gzip.compress(buf.getvalue()))
    out = load_depth_npy_gz(str(p))
    np.testing.assert_array_equal(out, arr)


def test_scene_splits():
    tr, ev = scene_splits(20, eval_fraction=0.2, seed=1)
    assert len(tr) == 16 and len(ev) == 4
    assert set(tr) | set(ev) == set(range(20))
    assert not set(tr) & set(ev)
