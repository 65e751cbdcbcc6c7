"""Multi-camera photoreal rollout rendering (simulated data generation).

The render side of the reference pipeline's unreleased stage 4
(`/root/reference/README.md:84-85`, SURVEY.md §3.4 render_rollout):
a trained background Gaussian scene composited with articulated object
meshes posed by sim joint trajectories (URDF FK), rendered from N
cameras per timestep. Cameras can be sharded across devices ('data'
axis) — each chip renders its camera subset independently (the ≥90%
linear-scaling workload of BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.compose import render_composite
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.mesh_raster import MeshRasterConfig
from robosimgs_tpu.scenegen.urdf_fk import URDFModel
from robosimgs_tpu.utils.meshio import Mesh


@dataclasses.dataclass
class ArticulatedObject:
    """A URDF-articulated object placed in the world."""

    model: URDFModel
    link_meshes: Dict[str, Mesh]
    base_pose: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))
    # pose-independent per-link appearance, baked once (texture
    # sampling at scan-scale meshes is O(V) — not per timestep)
    _link_colors: Dict[str, np.ndarray] = dataclasses.field(
        default_factory=dict, repr=False)

    @staticmethod
    def from_urdf(path: str, base_pose: Optional[np.ndarray] = None) -> "ArticulatedObject":
        model = URDFModel.parse(path)
        return ArticulatedObject(
            model=model, link_meshes=model.load_link_meshes(),
            base_pose=base_pose if base_pose is not None
            else np.eye(4, dtype=np.float32))

    def posed_meshes(self, q, base_pose=None) -> List[tuple]:
        """World-space (vertices, faces, colors) per link at joint config q.
        base_pose overrides the object's resting pose (moving objects in
        manipulation rollouts)."""
        T = self.model.fk(q, base=self.base_pose if base_pose is None
                          else base_pose)
        out = []
        for name, mesh in self.link_meshes.items():
            link = self.model.links[name]
            M = T[name] @ link.visual_origin
            scaled = mesh.vertices * link.visual_scale[None, :]
            v = scaled @ M[:3, :3].T + M[:3, 3]
            colors = self._link_colors.get(name)
            if colors is None:
                colors = mesh.baked_vertex_colors()
                if colors is None:
                    base = (link.color if link.color is not None
                            else np.full(3, 0.7))
                    colors = np.tile(base.astype(np.float32),
                                     (v.shape[0], 1))
                self._link_colors[name] = colors
            out.append((jnp.asarray(v), jnp.asarray(mesh.faces), jnp.asarray(colors)))
        return out


def _quantize_u8(rgb):
    return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)


@functools.lru_cache(maxsize=8)
def _jitted_composite(cfg: RenderConfig, mesh_cfg: MeshRasterConfig, impl: str,
                      as_uint8: bool = False):
    """One compiled composite per (config, shapes): every (timestep,
    camera) render of a rollout reuses it. (Batching all cameras into a
    lax.map body was tried and compiles pathologically slowly — the
    scan body would contain the full sort+Pallas pipeline; per-camera
    dispatch keeps compiles ~1 camera-sized and calls are queued
    asynchronously anyway.)"""
    def fn(background, camera, meshes, bg_color):
        rgb = render_composite(background, camera, list(meshes), cfg,
                               mesh_cfg, background=bg_color, impl=impl)["rgb"]
        return _quantize_u8(rgb) if as_uint8 else rgb
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _jitted_composite_batched(cfg: RenderConfig, mesh_cfg: MeshRasterConfig,
                              impl: str, n_cameras: int,
                              as_uint8: bool = False):
    """Unrolled multi-camera composite: ONE device dispatch renders all
    cameras of a timestep. Compile cost is ~n_cameras x the single-
    camera graph (can take many minutes the first time) but removes the
    per-call dispatch latency that dominates on remote-attached chips —
    opt in via render_rollout(batch_cameras=True) for long rollouts."""
    def fn(background, cam_tuple, meshes, bg_color):
        outs = [render_composite(background, cam, list(meshes), cfg,
                                 mesh_cfg, background=bg_color, impl=impl)["rgb"]
                for cam in cam_tuple]
        out = jnp.stack(outs)
        return _quantize_u8(out) if as_uint8 else out
    return jax.jit(fn)


_SHARDED_CACHE: Dict = {}


def make_camera_sharded_renderer(cfg: RenderConfig, mesh_cfg: MeshRasterConfig,
                                 impl: str, device_mesh, n_cameras: int,
                                 as_uint8: bool = False):
    """One-timestep renderer with cameras SHARDED over the 'data' mesh
    axis (the ≥90%-linear-scaling workload, BASELINE.md config 4): each
    chip renders n_cameras/n_data cameras against the replicated scene,
    independently — zero collectives in the hot path, so scaling is
    bounded only by per-chip render time. Use a (n, 1) mesh; any 'tile'
    axis present is treated as replication.

    Returns fn(background, cam_batch, meshes, bg_color) -> (C, H, W, 3)
    where cam_batch is a stacked Camera pytree (stack_cameras)."""
    from jax.sharding import PartitionSpec as P

    n_data = device_mesh.shape["data"]
    assert n_cameras % n_data == 0, (n_cameras, n_data)
    local = n_cameras // n_data

    def per_device(background, cam_batch, meshes, bg_color):
        outs = []
        for i in range(local):
            cam = jax.tree_util.tree_map(lambda x: x[i], cam_batch)
            rgb = render_composite(background, cam, list(meshes), cfg,
                                   mesh_cfg, background=bg_color,
                                   impl=impl)["rgb"]
            outs.append(rgb)
        out = jnp.stack(outs)
        return _quantize_u8(out) if as_uint8 else out

    return jax.jit(jax.shard_map(
        per_device, mesh=device_mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=P("data"), check_vma=False))


def render_rollout(
    background: Gaussians,
    objects: Sequence[ArticulatedObject],
    trajectory: np.ndarray,               # (T, total_dof) joint positions
    cameras: Sequence[Camera],
    cfg: RenderConfig = RenderConfig(),
    mesh_cfg: MeshRasterConfig = MeshRasterConfig(),
    background_color: Optional[jax.Array] = None,
    impl: str = "auto",
    base_poses: Optional[np.ndarray] = None,   # (T, n_objects, 4, 4)
    batch_cameras: bool = False,
    camera_mesh=None,
    as_uint8: bool = False,
) -> np.ndarray:
    """Render (T, C, H, W, 3) rollout frames.

    trajectory columns are the concatenation of each object's movable
    joints in order; base_poses optionally moves each object rigidly per
    timestep (sim manipulation trajectories: the object is grasped and
    carried while its joints articulate). Rendering is jitted once per
    camera resolution / mesh topology (posed vertices and camera
    pytrees are traced values), so a T x C rollout pays one compile.

    camera_mesh: optional jax.sharding.Mesh with a 'data' axis — shards
    the camera set across devices (make_camera_sharded_renderer);
    len(cameras) must divide by the axis size and all resolutions must
    match.
    """
    if impl == "auto":
        impl = "reference" if jax.default_backend() == "cpu" else "tiled"
    bg_color = (jnp.zeros((3,), jnp.float32) if background_color is None
                else jnp.asarray(background_color))
    # as_uint8 quantizes on-device: 4x less host transfer, which
    # dominates rollout wall time on remote-attached chips (frames are
    # written as 8-bit images anyway)
    if camera_mesh is not None:
        from robosimgs_tpu.parallel.distributed import stack_cameras

        key = (cfg, mesh_cfg, impl, len(cameras), as_uint8, camera_mesh)
        if key not in _SHARDED_CACHE:
            _SHARDED_CACHE[key] = make_camera_sharded_renderer(
                cfg, mesh_cfg, impl, camera_mesh, len(cameras), as_uint8)
        comps = _SHARDED_CACHE[key]
        cam_batch = stack_cameras(list(cameras))
    elif batch_cameras:
        compb = _jitted_composite_batched(cfg, mesh_cfg, impl, len(cameras),
                                          as_uint8)
    else:
        comp = _jitted_composite(cfg, mesh_cfg, impl, as_uint8)
    frames = []
    dof_split = np.cumsum([o.model.dof for o in objects])[:-1] if objects else []
    for t in range(trajectory.shape[0]):
        qs = np.split(np.asarray(trajectory[t]), dof_split) if objects else []
        meshes = []
        for i, (obj, q) in enumerate(zip(objects, qs)):
            base = base_poses[t, i] if base_poses is not None else None
            if base is not None and np.isnan(base).any():
                base = None   # never listed in the trajectory: resting pose
            meshes.extend(obj.posed_meshes(q, base_pose=base))
        if camera_mesh is not None:
            frames.append(comps(background, cam_batch, tuple(meshes),
                                bg_color))
        elif batch_cameras:
            frames.append(compb(background, tuple(cameras), tuple(meshes),
                                bg_color))
        else:
            cams_out = [comp(background, cam, tuple(meshes), bg_color)
                        for cam in cameras]
            frames.append(jnp.stack(cams_out))
    return np.asarray(jnp.stack(frames))


def open_close_trajectory(model: URDFModel, steps: int) -> np.ndarray:
    """A simple open-then-close trajectory through each joint's range."""
    ts = np.linspace(0.0, 1.0, steps)
    phase = 0.5 - 0.5 * np.cos(2 * np.pi * ts)   # 0 -> 1 -> 0
    lo = np.asarray([j.lower for j in model.movable])
    hi = np.asarray([j.upper for j in model.movable])
    return (lo[None, :] + phase[:, None] * (hi - lo)[None, :]).astype(np.float32)
