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

    @staticmethod
    def from_urdf(path: str, base_pose: Optional[np.ndarray] = None) -> "ArticulatedObject":
        model = URDFModel.parse(path)
        return ArticulatedObject(
            model=model, link_meshes=model.load_link_meshes(),
            base_pose=base_pose if base_pose is not None
            else np.eye(4, dtype=np.float32))

    def posed_meshes(self, q) -> List[tuple]:
        """World-space (vertices, faces, colors) per link at joint config q."""
        T = self.model.fk(q, base=self.base_pose)
        out = []
        for name, mesh in self.link_meshes.items():
            link = self.model.links[name]
            M = T[name] @ link.visual_origin
            scaled = mesh.vertices * link.visual_scale[None, :]
            v = scaled @ M[:3, :3].T + M[:3, 3]
            colors = mesh.vertex_colors
            if colors is None:
                base = link.color if link.color is not None else np.full(3, 0.7)
                colors = np.tile(base.astype(np.float32), (v.shape[0], 1))
            out.append((jnp.asarray(v), jnp.asarray(mesh.faces), jnp.asarray(colors)))
        return out


def render_rollout(
    background: Gaussians,
    objects: Sequence[ArticulatedObject],
    trajectory: np.ndarray,               # (T, total_dof) joint positions
    cameras: Sequence[Camera],
    cfg: RenderConfig = RenderConfig(),
    mesh_cfg: MeshRasterConfig = MeshRasterConfig(),
    background_color: Optional[jax.Array] = None,
    impl: str = "auto",
) -> np.ndarray:
    """Render (T, C, H, W, 3) rollout frames.

    trajectory columns are the concatenation of each object's movable
    joints in order.
    """
    frames = []
    dof_split = np.cumsum([o.model.dof for o in objects])[:-1] if objects else []
    for t in range(trajectory.shape[0]):
        qs = np.split(np.asarray(trajectory[t]), dof_split) if objects else []
        meshes = []
        for obj, q in zip(objects, qs):
            meshes.extend(obj.posed_meshes(q))
        cams_out = []
        for cam in cameras:
            out = render_composite(background, cam, meshes, cfg, mesh_cfg,
                                   background=background_color, impl=impl)
            cams_out.append(out["rgb"])
        frames.append(jnp.stack(cams_out))
    return np.asarray(jnp.stack(frames))


def open_close_trajectory(model: URDFModel, steps: int) -> np.ndarray:
    """A simple open-then-close trajectory through each joint's range."""
    ts = np.linspace(0.0, 1.0, steps)
    phase = 0.5 - 0.5 * np.cos(2 * np.pi * ts)   # 0 -> 1 -> 0
    lo = np.asarray([j.lower for j in model.movable])
    hi = np.asarray([j.upper for j in model.movable])
    return (lo[None, :] + phase[:, None] * (hi - lo)[None, :]).astype(np.float32)
