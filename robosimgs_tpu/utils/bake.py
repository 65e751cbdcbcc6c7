"""View->mesh appearance baking and midpoint subdivision.

Recovers per-vertex appearance for a scanned mesh from posed RGB views
(the reference workflow captures appearance as a photogrammetry texture;
its released artifacts ship TEXTURELESS part meshes + six posed renders
of the textured scan — `openbox_output/segmentation/{view_*.png,
camera_params.json}`). Baking back-projects those views onto the mesh
with z-buffer visibility tests, which is what lets the framework
synthesize DENSE captures of the real object for reconstruction
training (scripts/train_openbox_views.py --dense).

All heavy steps are vectorized: one mesh-raster z-buffer per view, one
(V,)-row projection per view, and a chunked distance argmin for filling
vertices no view sees.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.utils.meshio import Mesh


def subdivide_mesh(mesh: Mesh, iterations: int = 1) -> Mesh:
    """Midpoint (1:4) subdivision without smoothing: each triangle
    splits into four via deduplicated edge midpoints. Vertex colors and
    UVs are averaged onto the midpoints; the shared texture is carried.
    Geometry is unchanged — this only adds resolution for per-vertex
    baking."""
    v = mesh.vertices
    f = mesh.faces
    vc = mesh.vertex_colors
    uv = mesh.uv
    for _ in range(iterations):
        edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        edges_sorted = np.sort(edges, axis=1)
        uniq, inverse = np.unique(edges_sorted, axis=0, return_inverse=True)
        mid = 0.5 * (v[uniq[:, 0]] + v[uniq[:, 1]])
        base = v.shape[0]
        mid_idx = (base + inverse).reshape(3, -1).T      # (F, 3): m01 m12 m20
        v = np.concatenate([v, mid]).astype(np.float32)
        a, b, c = f[:, 0], f[:, 1], f[:, 2]
        m01, m12, m20 = mid_idx[:, 0], mid_idx[:, 1], mid_idx[:, 2]
        f = np.concatenate([
            np.stack([a, m01, m20], 1),
            np.stack([m01, b, m12], 1),
            np.stack([m20, m12, c], 1),
            np.stack([m01, m12, m20], 1),
        ]).astype(np.int32)
        if vc is not None:
            vc = np.concatenate(
                [vc, 0.5 * (vc[uniq[:, 0]] + vc[uniq[:, 1]])]).astype(np.float32)
        if uv is not None:
            uv = np.concatenate(
                [uv, 0.5 * (uv[uniq[:, 0]] + uv[uniq[:, 1]])]).astype(np.float32)
    return Mesh(vertices=v, faces=f, vertex_colors=vc, uv=uv,
                texture=mesh.texture)


def vertex_normals(mesh: Mesh) -> np.ndarray:
    """Area-weighted vertex normals (V, 3)."""
    v, f = mesh.vertices, mesh.faces
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return (vn / np.clip(n, 1e-12, None)).astype(np.float32)


def _masked_bilinear(img: np.ndarray, valid: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Bilinear image sample where each tap is weighted by its validity
    (object coverage): silhouette samples don't bleed background into
    the bake. Returns (colors (N, C), coverage (N,) = valid tap weight
    in [0, 1])."""
    H, W = img.shape[:2]
    x = np.clip(u, 0.0, W - 1.0)
    y = np.clip(v, 0.0, H - 1.0)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    acc = np.zeros((x.shape[0], img.shape[2]), np.float64)
    wacc = np.zeros((x.shape[0],), np.float64)
    for (yi, xi, w) in ((y0, x0, (1 - fx) * (1 - fy)),
                        (y0, x1, fx * (1 - fy)),
                        (y1, x0, (1 - fx) * fy),
                        (y1, x1, fx * fy)):
        wv = w * valid[yi, xi]
        acc += wv[:, None] * img[yi, xi]
        wacc += wv
    cols = acc / np.clip(wacc[:, None], 1e-12, None)
    return cols.astype(np.float32), wacc.astype(np.float32)


def bake_vertex_colors_from_views(
    mesh: Mesh,
    images: Sequence[np.ndarray],            # (H, W, 3) float32 in [0,1]
    cameras: Sequence[Camera],
    depth_tol: float = 0.01,                 # relative z-buffer slack
    min_cos: float = 0.15,                   # grazing-angle cutoff
    tile_capacity: int = 1024,
    max_tiles_per_tri: int = 512,
    tri_chunk: int = 0,                      # chunked z-buffer (big K)
    pet=None,                                # watchdog callback per view
) -> Tuple[np.ndarray, np.ndarray]:
    """Back-project posed views onto mesh vertices.

    Visibility is a per-view mesh-raster z-buffer test (vertex depth
    within depth_tol of the rasterized surface), weighting is
    cos(normal, to-camera) above the grazing cutoff. Vertices no view
    passes are filled from their nearest seen vertex. Returns
    (colors (V, 3) float32, seen (V,) bool). Capacity overflows in the
    raster pass raise (a truncated z-buffer silently corrupts
    visibility — CLAUDE.md convention)."""
    import jax.numpy as jnp

    from robosimgs_tpu.render.mesh_raster import (MeshRasterConfig,
                                                  rasterize_mesh)

    v = mesh.vertices
    V = v.shape[0]
    normals = vertex_normals(mesh)
    acc = np.zeros((V, 3), np.float64)
    wsum = np.zeros((V,), np.float64)
    cfg = MeshRasterConfig(tile_capacity=tile_capacity,
                           max_tiles_per_tri=max_tiles_per_tri,
                           tri_chunk=tri_chunk)
    jverts = jnp.asarray(v)
    jfaces = jnp.asarray(mesh.faces)
    # colors are irrelevant to the z-buffer but passing them as a traced
    # INPUT (not a baked constant) gives this raster the same program
    # signature as the colored target renders that typically follow —
    # one slow tunnel compile instead of two
    jcols = jnp.zeros_like(jverts)
    for img, cam in zip(images, cameras):
        out = rasterize_mesh(jverts, jfaces, cam, vertex_colors=jcols,
                             cfg=cfg)
        st = out["stats"]
        if int(st.truncated_gaussians) or int(st.overflowed_tiles):
            raise ValueError(
                f"bake raster truncation (tris={int(st.truncated_gaussians)}"
                f", tiles={int(st.overflowed_tiles)}, max_tile_count="
                f"{int(st.max_tile_count)}): raise capacities")
        if pet is not None:
            pet()
        zbuf = np.asarray(out["depth"])          # (H, W), +inf empty
        w2c = np.asarray(cam.w2c)
        pc = v @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        fx, fy = float(cam.fx), float(cam.fy)
        cx, cy = float(cam.cx), float(cam.cy)
        zs = np.where(z > 1e-6, z, 1.0)
        u = fx * pc[:, 0] / zs + cx - 0.5
        uu = fy * pc[:, 1] / zs + cy - 0.5
        H, W = zbuf.shape
        inb = (z > 1e-6) & (u >= 0) & (u <= W - 1) & (uu >= 0) & (uu <= H - 1)
        cover = np.isfinite(zbuf).astype(np.float64)
        znear, zcov = _masked_bilinear(
            np.where(np.isfinite(zbuf), zbuf, 0.0)[..., None], cover, u, uu)
        visible = inb & (zcov > 0.5) & (z <= znear[:, 0]
                                        * (1.0 + depth_tol) + 1e-4)
        eye = np.asarray(cam.origin)
        to_cam = eye[None, :] - v
        to_cam /= np.clip(np.linalg.norm(to_cam, axis=1, keepdims=True),
                          1e-12, None)
        cosw = np.abs((normals * to_cam).sum(1))
        col, ccov = _masked_bilinear(np.asarray(img, np.float32), cover,
                                     u, uu)
        # weight by view angle AND object coverage of the bilinear
        # footprint, so silhouette-straddling samples count less
        w = np.where(visible & (cosw > min_cos), cosw * ccov, 0.0)
        acc += w[:, None] * col
        wsum += w
    seen = wsum > 0
    colors = np.where(seen[:, None], acc / np.clip(wsum[:, None], 1e-12, None),
                      0.5).astype(np.float32)
    if seen.any() and not seen.all():
        colors[~seen] = colors[seen][_nearest_indices(v[~seen], v[seen])]
    return colors, seen


def _nearest_indices(query: np.ndarray, ref: np.ndarray,
                     chunk: int = 4096) -> np.ndarray:
    """argmin_j |query_i - ref_j| in chunks (bounds the (Q, R) matrix)."""
    out = np.empty(query.shape[0], np.int64)
    r2 = (ref ** 2).sum(1)
    for s in range(0, query.shape[0], chunk):
        q = query[s:s + chunk]
        d = (q ** 2).sum(1)[:, None] - 2.0 * q @ ref.T + r2[None, :]
        out[s:s + chunk] = d.argmin(1)
    return out
