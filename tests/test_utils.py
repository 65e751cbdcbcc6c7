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


def test_checked_catches_nan():
    import jax
    import pytest

    from robosimgs_tpu.utils.debug import assert_finite, checked

    def bad(x):
        return jnp.log(x)  # nan for negative input

    f = checked(jax.jit(bad))
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    with pytest.raises(Exception, match="nan"):
        f(jnp.asarray(-1.0))

    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(AssertionError, match="non-finite"):
        assert_finite({"a": jnp.asarray([1.0, np.nan])})


def test_colmap_roundtrip(tmp_path):
    """Write a synthetic COLMAP sparse model and read it back."""
    import struct

    from robosimgs_tpu.utils.colmap import load_colmap
    sparse = tmp_path / "sparse"
    sparse.mkdir()

    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        fh.write(struct.pack("<4d", 100.0, 90.0, 32.0, 24.0))

    # images.bin: two images; world->cam = identity and a translation
    with open(sparse / "images.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 2))
        for i, t in enumerate([(0.0, 0.0, 0.0), (1.0, 0.0, 0.0)]):
            fh.write(struct.pack("<idddddddi", i + 1, 1.0, 0, 0, 0,
                                 t[0], t[1], t[2], 1))
            fh.write(f"img_{i}.png".encode() + b"\x00")
            fh.write(struct.pack("<Q", 1))                  # one 2D point
            fh.write(struct.pack("<ddq", 1.0, 2.0, -1))

    # points3D.bin: two points with a 2-entry track
    with open(sparse / "points3D.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 2))
        for i in range(2):
            fh.write(struct.pack("<QdddBBBd", i, float(i), 0.0, 2.0,
                                 255, 128, 0, 0.5))
            fh.write(struct.pack("<Q", 2))
            fh.write(struct.pack("<ii", 1, 0) + struct.pack("<ii", 2, 0))

    frames, xyz, rgb = load_colmap(str(sparse), images_dir="imgs")
    assert len(frames) == 2
    cam = frames[0].camera
    assert float(cam.fx) == 100.0 and float(cam.fy) == 90.0
    assert cam.width == 64
    np.testing.assert_allclose(np.asarray(frames[0].camera.c2w),
                               np.eye(4), atol=1e-6)
    # second camera: w2c translation (1,0,0) -> c2w origin at (-1,0,0)
    np.testing.assert_allclose(np.asarray(frames[1].camera.origin),
                               [-1, 0, 0], atol=1e-6)
    assert frames[0].image_path.endswith("img_0.png")
    np.testing.assert_allclose(xyz, [[0, 0, 2], [1, 0, 2]], atol=1e-6)
    np.testing.assert_allclose(rgb[0], [1.0, 128 / 255, 0.0], atol=1e-6)


def test_undistort_points_roundtrip():
    from robosimgs_tpu.utils.undistort import (distort_normalized,
                                               undistort_points)

    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.5, 0.5, (200, 2))
    dist = np.array([-0.12, 0.03, 0.001, -0.002])
    xyd = distort_normalized(xy, dist)
    back = undistort_points(xyd, dist)
    np.testing.assert_allclose(back, xy, atol=1e-8)


def test_undistort_image_recovers_pinhole():
    """Synthesize a distorted capture of a smooth scene; undistorting it
    must reproduce the ideal pinhole image in the interior."""
    from robosimgs_tpu.utils.undistort import (undistort_image,
                                               undistort_points)

    h, w = 96, 128
    fx = fy = 110.0
    cx, cy = w / 2, h / 2
    dist = np.array([-0.15, 0.04, 0.0, 0.0])

    def scene(x, y):
        return np.stack([0.5 + 0.4 * np.sin(4 * x) * np.cos(3 * y),
                         0.5 + 0.3 * np.cos(5 * x + 2 * y),
                         0.5 + 0.35 * np.sin(2 * x - 3 * y)], -1)

    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    xn, yn = (u + 0.5 - cx) / fx, (v + 0.5 - cy) / fy
    ideal = scene(xn, yn).astype(np.float32)
    # the captured pixel at (u, v) sees the ray whose ideal normalized
    # coords distort TO (xn, yn)
    xy_ideal = undistort_points(np.stack([xn, yn], -1), dist)
    captured = scene(xy_ideal[..., 0], xy_ideal[..., 1]).astype(np.float32)

    out = undistort_image(captured, fx, fy, cx, cy, dist)
    assert out.shape == ideal.shape and out.dtype == np.float32
    m = 12  # interior crop: borders are edge-clamped by design
    err = np.abs(out[m:-m, m:-m] - ideal[m:-m, m:-m]).max()
    assert err < 0.01, err
    # zero distortion: exact passthrough
    same = undistort_image(ideal, fx, fy, cx, cy, np.zeros(4))
    np.testing.assert_array_equal(same, ideal)


def test_colmap_distortion_wired_to_frames(tmp_path):
    """SIMPLE_RADIAL coefficients land on Frame.distortion and load()
    applies them."""
    import struct

    from PIL import Image

    from robosimgs_tpu.utils.colmap import load_colmap

    sparse = tmp_path / "sparse"
    sparse.mkdir()
    with open(sparse / "cameras.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<iiQQ", 1, 2, 64, 48))   # SIMPLE_RADIAL
        fh.write(struct.pack("<4d", 80.0, 32.0, 24.0, -0.2))
    with open(sparse / "images.bin", "wb") as fh:
        fh.write(struct.pack("<Q", 1))
        fh.write(struct.pack("<idddddddi", 1, 1.0, 0, 0, 0, 0, 0, 0, 1))
        fh.write(b"img.png\x00")
        fh.write(struct.pack("<Q", 0))

    rng = np.random.default_rng(1)
    raw = (rng.uniform(0, 1, (48, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(raw).save(tmp_path / "img.png")

    frames, _, _ = load_colmap(str(sparse), images_dir=str(tmp_path))
    np.testing.assert_allclose(frames[0].distortion,
                               [-0.2, 0, 0, 0, 0, 0, 0, 0, 0])
    loaded = frames[0].load()
    assert loaded.shape == (48, 64, 3)
    # the warp must actually have moved pixels (k1 != 0)
    assert np.abs(loaded - raw.astype(np.float32) / 255.0).max() > 0.01


def test_fisheye_distort_roundtrip_and_semantics():
    """OPENCV_FISHEYE: roundtrip through the Newton inversion, plus the
    defining property that ZERO coefficients still warp (equidistant
    r -> atan(r), not pinhole)."""
    from robosimgs_tpu.utils.undistort import (distort_normalized,
                                               is_fisheye,
                                               normalize_distortion,
                                               undistort_points)

    dist = normalize_distortion("OPENCV_FISHEYE",
                                [-0.03, 0.012, -0.004, 0.0008])
    assert is_fisheye(dist) and dist.shape == (9,)
    rng = np.random.default_rng(1)
    xy = rng.uniform(-0.8, 0.8, (300, 2))
    xyd = distort_normalized(xy, dist)
    np.testing.assert_allclose(undistort_points(xyd, dist), xy, atol=1e-9)

    zero = normalize_distortion("OPENCV_FISHEYE", [0.0, 0.0, 0.0, 0.0])
    pt = np.array([[0.6, -0.4]])
    out = distort_normalized(pt, zero)
    r = np.hypot(*pt[0])
    np.testing.assert_allclose(np.hypot(*out[0]), np.arctan(r), atol=1e-12)
    # and the flag alone trips the "is there distortion" guards
    assert np.any(np.abs(zero) > 1e-12)


def test_full_opencv_rational_roundtrip():
    """FULL_OPENCV k1..k6 rational model roundtrips (k3/k4 support,
    VERDICT r2 missing #4)."""
    from robosimgs_tpu.utils.undistort import (distort_normalized,
                                               normalize_distortion,
                                               undistort_points)

    dist = normalize_distortion(
        "FULL_OPENCV", [-0.2, 0.05, 0.001, -0.002, -0.008, 0.1, -0.03, 0.004])
    rng = np.random.default_rng(2)
    xy = rng.uniform(-0.5, 0.5, (300, 2))
    xyd = distort_normalized(xy, dist)
    np.testing.assert_allclose(undistort_points(xyd, dist, iters=20), xy,
                               atol=1e-7)
    # legacy 4-vectors still accepted, same result as their 9-expansion
    d4 = np.array([-0.1, 0.02, 0.001, -0.001])
    d9 = np.concatenate([d4, np.zeros(5)])
    np.testing.assert_array_equal(distort_normalized(xy, d4),
                                  distort_normalized(xy, d9))


def test_fisheye_undistort_image_recovers_pinhole():
    """Backward-warp an OPENCV_FISHEYE capture onto the pinhole grid."""
    from robosimgs_tpu.utils.undistort import (normalize_distortion,
                                               undistort_image,
                                               undistort_points)

    h, w = 96, 128
    fx = fy = 110.0
    cx, cy = w / 2, h / 2
    dist = normalize_distortion("OPENCV_FISHEYE", [0.05, -0.01, 0.002, 0.0])

    def scene(x, y):
        return np.stack([0.5 + 0.4 * np.sin(4 * x) * np.cos(3 * y),
                         0.5 + 0.3 * np.cos(5 * x + 2 * y),
                         0.5 + 0.35 * np.sin(2 * x - 3 * y)], -1)

    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    xn, yn = (u + 0.5 - cx) / fx, (v + 0.5 - cy) / fy
    ideal = scene(xn, yn).astype(np.float32)
    xy_ideal = undistort_points(np.stack([xn, yn], -1), dist)
    captured = scene(xy_ideal[..., 0], xy_ideal[..., 1]).astype(np.float32)
    out = undistort_image(captured, fx, fy, cx, cy, dist)
    m = 12
    err = np.abs(out[m:-m, m:-m] - ideal[m:-m, m:-m]).max()
    assert err < 0.01, err


def test_transforms_json_distortion_parsed(tmp_path):
    """transforms.json k1/k2/p1/p2 (+ per-frame override and fisheye
    camera_model) land on Frame.distortion."""
    import json

    from robosimgs_tpu.train.data import parse_transforms_json

    meta = {
        "camera_model": "OPENCV",
        "k1": -0.1, "k2": 0.02, "p1": 0.001, "p2": -0.002,
        "fl_x": 100.0, "fl_y": 100.0, "cx": 32.0, "cy": 32.0,
        "w": 64, "h": 64,
        "frames": [
            {"file_path": "a.png",
             "transform_matrix": np.eye(4).tolist()},
            {"file_path": "b.png", "camera_model": "OPENCV_FISHEYE",
             "k1": 0.03, "k2": 0.0, "k3": 0.0, "k4": 0.0,
             "transform_matrix": np.eye(4).tolist()},
        ],
    }
    p = tmp_path / "transforms.json"
    p.write_text(json.dumps(meta))
    frames = parse_transforms_json(str(p))
    d0 = frames[0].distortion
    np.testing.assert_allclose(d0[:4], [-0.1, 0.02, 0.001, -0.002])
    assert d0[8] == 0.0
    d1 = frames[1].distortion
    assert d1[8] == 1.0 and d1[0] == 0.03
    # undistorted default: no distortion keys at all -> None
    meta2 = {k: v for k, v in meta.items()
             if k not in ("k1", "k2", "p1", "p2")}
    meta2["frames"] = [meta["frames"][0]]
    p2 = tmp_path / "t2.json"
    p2.write_text(json.dumps(meta2))
    assert parse_transforms_json(str(p2))[0].distortion is None
