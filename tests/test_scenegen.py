import os

import jax
import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.scenegen.rollout import (ArticulatedObject,
                                            open_close_trajectory,
                                            render_rollout)
from robosimgs_tpu.scenegen.urdf_fk import URDFModel, rpy_to_matrix
from robosimgs_tpu.utils.meshio import Mesh, save_mesh

BOX_URDF = """<?xml version="1.0"?>
<robot name="testbox">
  <link name="body">
    <visual>
      <geometry><mesh filename="body.glb" scale="1 1 1"/></geometry>
      <material name="m"><color rgba="0.8 0.6 0.4 1.0"/></material>
    </visual>
    <inertial><mass value="0.5"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
  <link name="lid">
    <visual>
      <geometry><mesh filename="lid.glb" scale="1 1 1"/></geometry>
      <material name="m2"><color rgba="0.4 0.6 0.8 1.0"/></material>
    </visual>
    <inertial><mass value="0.2"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="body"/><child link="lid"/>
    <origin xyz="0 0.5 0.2" rpy="0 0 0"/>
    <axis xyz="1 0 0"/>
    <limit lower="0.0" upper="1.57" effort="5" velocity="2"/>
    <dynamics friction="0.5" damping="0.2"/>
  </joint>
</robot>"""


def box_mesh(size=(0.5, 0.5, 0.2)):
    sx, sy, sz = size
    v = np.array([[x, y, z] for x in (-sx, sx) for y in (-sy, sy) for z in (-sz, sz)],
                 np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return Mesh(vertices=v, faces=f)


def test_rpy_matrix():
    np.testing.assert_allclose(rpy_to_matrix([0, 0, 0]), np.eye(3), atol=1e-7)
    R = rpy_to_matrix([0, 0, np.pi / 2])
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_urdf_parse_and_fk():
    m = URDFModel.parse(BOX_URDF)
    assert m.root == "body"
    assert m.dof == 1
    j = m.movable[0]
    assert j.name == "hinge" and j.upper == 1.57
    assert m.links["lid"].mass == 0.2

    T0 = m.fk({"hinge": 0.0})
    np.testing.assert_allclose(T0["lid"][:3, 3], [0, 0.5, 0.2], atol=1e-6)
    T90 = m.fk({"hinge": np.pi / 2})
    # rotation about +x at the hinge: lid frame rotated
    R = T90["lid"][:3, :3]
    np.testing.assert_allclose(R @ [0, 1, 0], [0, 0, 1], atol=1e-6)


def test_urdf_validate_ok_and_bad():
    m = URDFModel.parse(BOX_URDF)
    assert m.validate() == []
    bad = BOX_URDF.replace('lower="0.0" upper="1.57"', 'lower="2.0" upper="1.0"')
    m2 = URDFModel.parse(bad)
    assert any("lower" in p for p in m2.validate())


def test_urdf_fk_base_pose():
    m = URDFModel.parse(BOX_URDF)
    base = np.eye(4, dtype=np.float32)
    base[:3, 3] = [1, 2, 3]
    T = m.fk({"hinge": 0.0}, base=base)
    np.testing.assert_allclose(T["body"][:3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(T["lid"][:3, 3], [1, 2.5, 3.2], atol=1e-6)


def test_articulated_object_roundtrip(tmp_path):
    save_mesh(str(tmp_path / "body.glb"), box_mesh())
    save_mesh(str(tmp_path / "lid.glb"), box_mesh((0.5, 0.5, 0.05)))
    urdf_path = tmp_path / "robot.urdf"
    urdf_path.write_text(BOX_URDF)
    obj = ArticulatedObject.from_urdf(str(urdf_path))
    assert set(obj.link_meshes) == {"body", "lid"}
    meshes = obj.posed_meshes(np.array([0.5]))
    assert len(meshes) == 2
    for v, f, c in meshes:
        assert np.isfinite(np.asarray(v)).all()
        assert c.shape == v.shape


def test_render_rollout_end_to_end(tmp_path):
    save_mesh(str(tmp_path / "body.glb"), box_mesh())
    save_mesh(str(tmp_path / "lid.glb"), box_mesh((0.5, 0.5, 0.05)))
    (tmp_path / "robot.urdf").write_text(BOX_URDF)
    obj = ArticulatedObject.from_urdf(str(tmp_path / "robot.urdf"))

    bg = Gaussians.random(jax.random.PRNGKey(0), 50, sh_degree=1, extent=2.0)
    cams = [Camera.look_at([3, 0.5, 1.5], [0, 0, 0], [0, 0, 1], 60.0, 48, 32),
            Camera.look_at([0.5, 3, 1.5], [0, 0, 0], [0, 0, 1], 60.0, 48, 32)]
    traj = open_close_trajectory(obj.model, steps=3)
    assert traj.shape == (3, 1)
    frames = render_rollout(bg, [obj], traj, cams,
                            cfg=RenderConfig(tile_capacity=128), impl="reference")
    assert frames.shape == (3, 2, 32, 48, 3)
    assert np.isfinite(frames).all()
    # lid moves: frames differ across time
    assert np.abs(frames[0] - frames[1]).max() > 1e-3


def test_reference_urdf_parses():
    """The reference's shipped example URDF must parse + FK cleanly."""
    path = "/root/reference/Articulation/openbox_output/urdf/articulated_object.urdf"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference not mounted")
    m = URDFModel.parse(path)
    assert m.dof == 1
    assert m.movable[0].name == "hinge"
    T = m.fk({"hinge": 0.7})
    assert np.isfinite(T["lid"]).all()
    # hinge joint dynamics carried through
    assert m.movable[0].friction == 0.5


def test_render_rollout_with_base_poses(tmp_path):
    save_mesh(str(tmp_path / "body.glb"), box_mesh())
    save_mesh(str(tmp_path / "lid.glb"), box_mesh((0.5, 0.5, 0.05)))
    (tmp_path / "robot.urdf").write_text(BOX_URDF)
    obj = ArticulatedObject.from_urdf(str(tmp_path / "robot.urdf"))
    bg = Gaussians.random(jax.random.PRNGKey(0), 30, sh_degree=1, extent=2.0)
    cams = [Camera.look_at([3, 0.5, 1.5], [0, 0, 0], [0, 0, 1], 60.0, 32, 32)]
    traj = np.zeros((2, 1), np.float32)   # joints fixed
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1, 1))
    poses[1, 0, :3, 3] = [0.0, 0.5, 0.0]  # object slides between frames
    frames = render_rollout(bg, [obj], traj, cams,
                            cfg=RenderConfig(tile_capacity=128),
                            impl="reference", base_poses=poses)
    assert frames.shape[0] == 2
    # object moved: frames differ even with fixed joints
    assert np.abs(frames[0] - frames[1]).max() > 1e-3


def test_trajectory_roundtrip(tmp_path):
    from robosimgs_tpu.scenegen.trajectory import (load_trajectory,
                                                   save_trajectory)
    m = URDFModel.parse(BOX_URDF)
    joints = np.array([[0.0], [0.5], [1.0]], np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1, 1))
    poses[2, 0, :3, 3] = [0.1, 0.2, 0.3]
    p = str(tmp_path / "traj.json")
    save_trajectory(p, ["testbox"], joints, base_poses=poses, dofs=[1])
    j2, b2 = load_trajectory(p, [m])
    np.testing.assert_allclose(j2, joints, atol=1e-6)
    np.testing.assert_allclose(b2, poses, atol=1e-6)


def test_trajectory_holds_previous_values(tmp_path):
    import json as _json
    from robosimgs_tpu.scenegen.trajectory import load_trajectory
    m = URDFModel.parse(BOX_URDF)
    data = {"objects": ["testbox"], "steps": [
        {"joints": {"testbox": [0.3]}},
        {},                                  # joint holds 0.3
        {"joints": {"testbox": [0.9]}},
    ]}
    p = tmp_path / "t.json"
    p.write_text(_json.dumps(data))
    j, b = load_trajectory(str(p), [m])
    np.testing.assert_allclose(j[:, 0], [0.3, 0.3, 0.9], atol=1e-6)
    assert b is None


def test_trajectory_unlisted_base_pose_is_nan_sentinel(tmp_path):
    """An object never listed in base_poses must NOT get identity
    (which would override its resting pose in render_rollout) —
    ADVICE.md r1. Unlisted entries are NaN sentinels; explicitly listed
    ones carry forward."""
    import json as _json
    from robosimgs_tpu.scenegen.trajectory import load_trajectory
    m1 = URDFModel.parse(BOX_URDF)
    m2 = URDFModel.parse(BOX_URDF)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    data = {"objects": ["a", "b"], "steps": [
        {"joints": {"a": [0.1], "b": [0.2]},
         "base_poses": {"a": pose.tolist()}},
        {"joints": {"a": [0.2], "b": [0.3]}},    # a holds explicit pose
    ]}
    p = tmp_path / "t.json"
    p.write_text(_json.dumps(data))
    _, b = load_trajectory(str(p), [m1, m2], object_names=["a", "b"])
    np.testing.assert_allclose(b[0, 0], pose, atol=1e-6)
    np.testing.assert_allclose(b[1, 0], pose, atol=1e-6)  # carried forward
    assert np.isnan(b[:, 1]).all()                        # never listed


def test_trajectory_dof_mismatch_raises(tmp_path):
    import json as _json

    import pytest
    from robosimgs_tpu.scenegen.trajectory import load_trajectory
    m = URDFModel.parse(BOX_URDF)
    p = tmp_path / "t.json"
    p.write_text(_json.dumps({"objects": ["testbox"], "steps": [
        {"joints": {"testbox": [0.1, 0.2]}}]}))
    with pytest.raises(ValueError, match="expects 1 joints"):
        load_trajectory(str(p), [m])


def test_render_rollout_uint8(tmp_path):
    save_mesh(str(tmp_path / "body.glb"), box_mesh())
    save_mesh(str(tmp_path / "lid.glb"), box_mesh((0.5, 0.5, 0.05)))
    (tmp_path / "robot.urdf").write_text(BOX_URDF)
    obj = ArticulatedObject.from_urdf(str(tmp_path / "robot.urdf"))
    bg = Gaussians.random(jax.random.PRNGKey(0), 30, sh_degree=1, extent=2.0)
    cams = [Camera.look_at([3, 0.5, 1.5], [0, 0, 0], [0, 0, 1], 60.0, 32, 32)]
    traj = open_close_trajectory(obj.model, 2)
    f8 = render_rollout(bg, [obj], traj, cams,
                        cfg=RenderConfig(tile_capacity=128),
                        impl="reference", as_uint8=True)
    f32 = render_rollout(bg, [obj], traj, cams,
                         cfg=RenderConfig(tile_capacity=128),
                         impl="reference")
    assert f8.dtype == np.uint8
    np.testing.assert_allclose(
        f8.astype(np.float32) / 255.0, np.clip(f32, 0, 1), atol=1 / 255 + 1e-6)


def test_render_rollout_camera_sharded(tmp_path):
    """Camera-sharded rollout (BASELINE config 4 workload): 8 cameras
    over an 8-way 'data' mesh must match the per-camera dispatch path
    exactly — the sharding is pure data parallelism with no collectives."""
    from robosimgs_tpu.parallel.mesh import make_mesh

    save_mesh(str(tmp_path / "body.glb"), box_mesh())
    save_mesh(str(tmp_path / "lid.glb"), box_mesh((0.5, 0.5, 0.05)))
    (tmp_path / "robot.urdf").write_text(BOX_URDF)
    obj = ArticulatedObject.from_urdf(str(tmp_path / "robot.urdf"))
    bg = Gaussians.random(jax.random.PRNGKey(0), 50, sh_degree=1, extent=2.0)
    cams = [Camera.look_at([3 * np.cos(a), 3 * np.sin(a), 1.5], [0, 0, 0],
                           [0, 0, 1], 60.0, 32, 32)
            for a in np.linspace(0, 2 * np.pi, 8, endpoint=False)]
    traj = open_close_trajectory(obj.model, steps=2)
    mesh = make_mesh(8, 1)
    cfg = RenderConfig(tile_capacity=128)
    sharded = render_rollout(bg, [obj], traj, cams, cfg=cfg,
                             impl="reference", camera_mesh=mesh)
    percam = render_rollout(bg, [obj], traj, cams, cfg=cfg,
                            impl="reference")
    assert sharded.shape == percam.shape == (2, 8, 32, 32, 3)
    np.testing.assert_allclose(sharded, percam, atol=1e-5)


def test_render_rollout_cli_autotune(tmp_path):
    """CLI end-to-end with --autotune: scene-measured capacities (incl.
    the two-tier sort pick) drive the render and frames land on disk."""
    from robosimgs_tpu.cli.render_rollout import main as cli_main
    from robosimgs_tpu.train.io_ply import save_ply

    bg = Gaussians.random(jax.random.PRNGKey(3), 80, sh_degree=1, extent=1.5)
    save_ply(str(tmp_path / "scene.ply"), bg)
    out = tmp_path / "frames"
    cli_main(["--scene", str(tmp_path / "scene.ply"),
              "--steps", "2", "--n-cameras", "2",
              "--width", "48", "--height", "32",
              "--impl", "reference", "--autotune",
              "--output", str(out)])
    import glob
    files = sorted(glob.glob(str(out / "frame_*.png")))
    assert len(files) == 4          # 2 steps x 2 cameras
