import json
import os

import jax
import numpy as np

from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.train.data import (denormalize_points,
                                      parse_dataparser_transforms,
                                      parse_transforms_json, synthetic_scene)
from robosimgs_tpu.train.io_ply import load_ply, save_ply


def test_ply_roundtrip(tmp_path):
    g = Gaussians.random(jax.random.PRNGKey(0), 50, sh_degree=3, capacity=64)
    p = str(tmp_path / "scene.ply")
    save_ply(p, g)
    g2 = load_ply(p)
    assert int(g2.num_alive) == 50
    alive = np.asarray(g.alive)
    for field in ["means", "quats", "log_scales", "logit_opacities", "sh_dc", "sh_rest"]:
        a = np.asarray(getattr(g, field))[alive]
        b = np.asarray(getattr(g2, field))[:50]
        np.testing.assert_allclose(b, a, atol=1e-6, err_msg=field)


def test_ply_load_ignores_trailing_elements(tmp_path):
    """Exporters that append a face (or any other) element after vertex
    must not corrupt the vertex schema (ADVICE.md r1: properties were
    collected across ALL elements, mis-parsing the buffer)."""
    g = Gaussians.random(jax.random.PRNGKey(0), 12, sh_degree=1, capacity=12)
    p = str(tmp_path / "s.ply")
    save_ply(p, g)
    raw = open(p, "rb").read()
    head, body = raw.split(b"end_header\n", 1)
    head = head.decode().replace(
        "end_header", "").rstrip("\n")
    head += ("\nelement face 0\n"
             "property list uchar int vertex_indices\n"
             "element extra 1\n"
             "property float weirdness\nend_header\n")
    p2 = str(tmp_path / "s2.ply")
    # the extra element declares 1 row of 1 float -> append 4 bytes
    open(p2, "wb").write(head.encode() + body + b"\x00\x00\x00\x00")
    g2 = load_ply(p2)
    assert int(g2.num_alive) == 12
    np.testing.assert_allclose(np.asarray(g2.means),
                               np.asarray(g.means), atol=1e-6)


def test_camera_extent_from_rig():
    from robosimgs_tpu.train.data import camera_extent
    _, frames = synthetic_scene(seed=0, n_gaussians=8, n_cameras=6,
                                width=32, height=32, sh_degree=0)
    ext = camera_extent(frames)
    centers = np.stack([np.asarray(f.camera.origin) for f in frames])
    radius = np.linalg.norm(centers - centers.mean(0), axis=1).max()
    assert abs(ext - 1.1 * radius) < 1e-5
    assert ext > 0


def test_ply_header_layout(tmp_path):
    """The header must match the standard 3DGS property layout."""
    g = Gaussians.random(jax.random.PRNGKey(0), 5, sh_degree=1)
    p = str(tmp_path / "s.ply")
    save_ply(p, g)
    head = open(p, "rb").read(2000).split(b"end_header")[0].decode()
    for prop in ["f_dc_0", "f_rest_0", "f_rest_8", "opacity", "scale_2", "rot_3"]:
        assert f"property float {prop}" in head
    assert "f_rest_9" not in head  # degree 1 -> 9 rest coeffs


def test_transforms_json_parsing(tmp_path):
    meta = {
        "fl_x": 100.0, "fl_y": 100.0, "cx": 32.0, "cy": 32.0, "w": 64, "h": 64,
        "frames": [
            {"file_path": "images/frame_0001.png",
             "transform_matrix": np.eye(4).tolist()},
            {"file_path": "images/frame_0002",
             "fl_x": 50.0, "fl_y": 50.0, "cx": 16.0, "cy": 16.0, "w": 32, "h": 32,
             "transform_matrix": np.eye(4).tolist()},
        ],
    }
    p = tmp_path / "transforms.json"
    p.write_text(json.dumps(meta))
    frames = parse_transforms_json(str(p))
    assert len(frames) == 2
    assert frames[0].camera.width == 64
    assert float(frames[1].camera.fx) == 50.0
    assert frames[1].image_path.endswith("frame_0002.png")
    # OpenGL identity c2w -> OpenCV: looking down -z world
    c2w = np.asarray(frames[0].camera.c2w)
    np.testing.assert_allclose(c2w[:3, 2], [0, 0, -1], atol=1e-6)


def test_dataparser_denormalize(tmp_path):
    R = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32)
    t = np.array([0.1, -0.2, 0.3], np.float32)
    T = np.concatenate([R, t[:, None]], 1)
    meta = {"transform": T.tolist(), "scale": 0.25}
    p = tmp_path / "dataparser_transforms.json"
    p.write_text(json.dumps(meta))
    T2, s = parse_dataparser_transforms(str(p))
    world = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    normalized = s * (world @ R.T + t)
    back = denormalize_points(normalized, T2, s)
    np.testing.assert_allclose(back, world, atol=1e-5)


def test_synthetic_scene_shapes():
    gt, frames = synthetic_scene(0, 30, 4, 32, 24)
    assert gt.capacity == 30
    assert len(frames) == 4
    assert frames[0].camera.width == 32


def test_synthetic_mesh_scene():
    from robosimgs_tpu.train.data import synthetic_mesh_scene
    mesh, frames = synthetic_mesh_scene(0, 4, 48, 36)
    assert len(frames) == 4
    for f in frames:
        assert f.image.shape == (36, 48, 3)
        assert np.isfinite(f.image).all()
    # scene is actually visible (not all background)
    assert frames[0].image.std() > 0.05
