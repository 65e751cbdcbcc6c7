"""Triangle mesh rasterizer (jnp, tile-binned z-buffer).

The TPU-native replacement for the reference's trimesh/pyglet OpenGL
offscreen renderer (`interactive_segmenter.py:255-381`, SURVEY.md §2.2)
and the mesh half of rollout compositing (SURVEY.md §3.4): projects
triangles with the same camera/pixel conventions as the splat renderer,
bins them to 16x16 tiles with the shared rect binner, and resolves
visibility per pixel with perspective-correct 1/z interpolation.
Returns rgb/depth/mask/face_id; depth feeds the depth-merged
splat+mesh compositor (render/compose.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.render.binning import BinStats, bin_rects
from robosimgs_tpu.render.gathered import untile
from robosimgs_tpu.render.tiles import num_tiles


@dataclasses.dataclass(frozen=True)
class MeshRasterConfig:
    tile_size: int = 16
    max_tiles_per_tri: int = 128
    tile_capacity: int = 512
    near: float = 0.01


def rasterize_mesh(
    vertices: jax.Array,          # (V, 3) world space
    faces: jax.Array,             # (F, 3) int32
    camera: Camera,
    vertex_colors: Optional[jax.Array] = None,   # (V, 3)
    face_colors: Optional[jax.Array] = None,     # (F, 3)
    cfg: MeshRasterConfig = MeshRasterConfig(),
    face_valid: Optional[jax.Array] = None,      # (F,) bool
) -> Dict[str, jax.Array]:
    """Returns rgb (H,W,3), depth (H,W; +inf empty), mask (H,W) bool,
    face_id (H,W) int32 (-1 empty), stats."""
    W, H = camera.width, camera.height
    ts = cfg.tile_size
    tiles_x, tiles_y = num_tiles(W, H, ts)
    P = ts * ts

    w2c = camera.w2c
    t = vertices @ w2c[:3, :3].T + w2c[:3, 3]
    z = t[:, 2]
    z_safe = jnp.where(z > cfg.near, z, 1.0)
    u = camera.fx * t[:, 0] / z_safe + camera.cx - 0.5
    v = camera.fy * t[:, 1] / z_safe + camera.cy - 0.5
    inv_z = jnp.where(z > cfg.near, 1.0 / z_safe, 0.0)

    f = faces
    tri_uv = jnp.stack([jnp.stack([u[f[:, i]], v[f[:, i]]], -1) for i in range(3)], 1)  # (F,3,2)
    tri_invz = jnp.stack([inv_z[f[:, i]] for i in range(3)], 1)                          # (F,3)
    tri_z = jnp.stack([z[f[:, i]] for i in range(3)], 1)
    tri_infront = (tri_z > cfg.near).all(1)
    # Limitation (documented, counted — ADVICE.md r1): triangles that
    # STRADDLE the near plane are dropped whole rather than clipped
    # (behind-camera vertices project to meaningless uv, so keeping them
    # un-clipped would smear geometry across the screen). The count is
    # surfaced as `near_dropped` so close-up rollout views can detect
    # silently vanishing surfaces.
    near_straddle = (tri_z > cfg.near).any(1) & ~tri_infront

    if face_colors is None:
        if vertex_colors is None:
            vertex_colors = jnp.full_like(vertices, 0.7)
        tri_col = jnp.stack([vertex_colors[f[:, i]] for i in range(3)], 1)   # (F,3,3)
    else:
        tri_col = jnp.broadcast_to(face_colors[:, None, :], (f.shape[0], 3, 3))

    # signed twice-area in screen space; degenerate triangles dropped
    e1 = tri_uv[:, 1] - tri_uv[:, 0]
    e2 = tri_uv[:, 2] - tri_uv[:, 0]
    area = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    valid = tri_infront & (jnp.abs(area) > 1e-12)
    if face_valid is not None:
        valid = valid & face_valid

    # tile bbox
    minu = jnp.min(tri_uv[:, :, 0], 1)
    maxu = jnp.max(tri_uv[:, :, 0], 1)
    minv = jnp.min(tri_uv[:, :, 1], 1)
    maxv = jnp.max(tri_uv[:, :, 1], 1)
    on_screen = (maxu >= 0) & (minu <= W - 1) & (maxv >= 0) & (minv <= H - 1)
    valid = valid & on_screen
    tx0 = jnp.clip(jnp.floor(minu / ts), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(maxu / ts), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(minv / ts), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(maxv / ts), 0, tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.where(valid, tx1, tx0 - 1)  # empty bbox for invalid

    rank = jnp.arange(f.shape[0], dtype=jnp.int32)  # z-buffer: order irrelevant
    sel, counts, stats = bin_rects(tx0, ty0, tx1, ty1, rank, valid,
                                   tiles_x, tiles_y, cfg.max_tiles_per_tri,
                                   cfg.tile_capacity)

    K = cfg.tile_capacity
    g_uv = tri_uv[sel]        # (T, K, 3, 2)
    g_invz = tri_invz[sel]    # (T, K, 3)
    g_col = tri_col[sel]      # (T, K, 3, 3)
    g_area = area[sel]        # (T, K)
    g_fid = jnp.where(
        jnp.arange(K)[None, :] < counts[:, None], sel, -1)

    def one_tile(args):
        t_idx, uvk, invzk, colk, areak, fidk, count = args
        # lax.map lowers to a scan, so this cond is real control flow:
        # the ~all-empty tiles of a small mesh skip the (P, K) math.
        return jax.lax.cond(count > 0, _tile_work,
                            lambda a: _empty_tile(ts), args)

    def _empty_tile(ts_):
        P_ = ts_ * ts_
        out = jnp.zeros((8, P_), jnp.float32)
        out = out.at[3].set(jnp.inf)     # depth
        out = out.at[5].set(-1.0)        # face id
        return out

    def _tile_work(args):
        t_idx, uvk, invzk, colk, areak, fidk, count = args
        ox = (t_idx % tiles_x) * ts
        oy = (t_idx // tiles_x) * ts
        p = jnp.arange(P, dtype=jnp.int32)
        px = (ox + p % ts).astype(jnp.float32)[:, None]       # (P,1)
        py = (oy + p // ts).astype(jnp.float32)[:, None]
        ax, ay = uvk[None, :, 0, 0], uvk[None, :, 0, 1]       # (1,K)
        bx, by = uvk[None, :, 1, 0], uvk[None, :, 1, 1]
        cx, cy = uvk[None, :, 2, 0], uvk[None, :, 2, 1]
        inv_area = 1.0 / jnp.where(areak == 0, 1.0, areak)[None, :]
        wa = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area
        wb = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * inv_area
        wc = 1.0 - wa - wb
        kmask = (jnp.arange(K, dtype=jnp.int32) < count)[None, :]
        inside = (wa >= 0) & (wb >= 0) & (wc >= 0) & kmask
        invz_p = (wa * invzk[None, :, 0] + wb * invzk[None, :, 1]
                  + wc * invzk[None, :, 2])
        z_p = 1.0 / jnp.maximum(invz_p, 1e-12)
        z_mask = jnp.where(inside & (invz_p > 0), z_p, jnp.inf)
        best = jnp.argmin(z_mask, axis=1)                     # (P,)
        depth = jnp.take_along_axis(z_mask, best[:, None], 1)[:, 0]
        hit = jnp.isfinite(depth)

        wab = jnp.stack([
            jnp.take_along_axis(wa, best[:, None], 1)[:, 0],
            jnp.take_along_axis(wb, best[:, None], 1)[:, 0],
            jnp.take_along_axis(wc, best[:, None], 1)[:, 0]], -1)  # (P,3)
        col_best = colk[best]          # (P, 3, 3)
        invz_best = invzk[best]        # (P, 3)
        invz_pix = jnp.take_along_axis(invz_p, best[:, None], 1)[:, 0]
        # perspective-correct attribute interpolation
        col = jnp.einsum("pi,pic,pi->pc", wab, col_best,
                         invz_best) / jnp.maximum(invz_pix, 1e-12)[:, None]
        fid = jnp.where(hit, fidk[best], -1)
        col = jnp.where(hit[:, None], col, 0.0)
        depth_out = jnp.where(hit, depth, jnp.inf)
        # pack into (8, P) rows: r g b depth hit fid 0 0
        out = jnp.stack([col[:, 0], col[:, 1], col[:, 2], depth_out,
                         hit.astype(jnp.float32), fid.astype(jnp.float32),
                         jnp.zeros_like(depth), jnp.zeros_like(depth)], 0)
        return out

    T = tiles_x * tiles_y
    t_idx = jnp.arange(T, dtype=jnp.int32)
    tiles = jax.lax.map(one_tile, (t_idx, g_uv, g_invz, g_col, g_area, g_fid, counts))
    img = untile(tiles, tiles_x, tiles_y, W, H, ts)  # (H, W, 8)
    mask = img[..., 4] > 0.5
    depth = jnp.where(mask, img[..., 3], jnp.inf)
    return {
        "rgb": img[..., :3],
        "depth": depth,
        "mask": mask,
        "face_id": jnp.where(mask, img[..., 5].astype(jnp.int32), -1),
        "stats": stats,
        "near_dropped": jnp.sum(near_straddle).astype(jnp.int32),
    }
