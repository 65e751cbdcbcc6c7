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
    # clip triangles straddling the near plane into <=2 sub-triangles
    # (static shapes: every face gets two output slots, the second
    # degenerate unless clipping splits a quad). Off = drop straddling
    # triangles whole and count them (the pre-round-2 behavior).
    clip_near: bool = True
    # candidate-chunked z-buffering: stream tile candidates in chunks of
    # tri_chunk, carrying only the per-pixel running (depth, winner) —
    # tile_capacity becomes HBM-bounded instead of materializing
    # (T, K, 26) gathers (the mesh analog of the splat compositor's
    # tile_chunk). 0 = unchunked legacy path.
    tri_chunk: int = 0


def _clip_near_plane(tri, attr, near: float):
    """Clip camera-space triangles against z = near.

    tri (F, 3, 3) camera-space vertices; attr (F, 3, C) per-vertex
    attributes interpolated at clip points. Returns (tri2 (2F, 3, 3),
    attr2 (2F, 3, C), valid (2F,) bool, src (2F,) int32 original face).

    Canonicalized by cyclic rotation (winding-preserving): one-in-front
    clips to a single triangle, two-in-front to a quad = two triangles;
    fully-behind faces come back invalid.
    """
    F = tri.shape[0]
    eps = 1e-4
    znear = near * (1.0 + eps)   # strictly in front of the cull test
    d = tri[:, :, 2] - znear     # (F, 3)
    front = d > 0.0
    k = front.sum(-1)            # in-front count per face

    # rotate so: k==1 -> the front vertex at slot 0; k==2 -> the behind
    # vertex at slot 2 (cyclic rotation preserves winding)
    i_front = jnp.argmax(front, axis=-1).astype(jnp.int32)
    i_back = jnp.argmax(~front, axis=-1).astype(jnp.int32)
    r = jnp.where(k == 1, i_front,
                  jnp.where(k == 2, (i_back + 1) % 3, 0))
    idx = (jnp.arange(3, dtype=jnp.int32)[None, :] + r[:, None]) % 3
    tri_c = jnp.take_along_axis(tri, idx[:, :, None], axis=1)
    attr_c = jnp.take_along_axis(attr, idx[:, :, None], axis=1)
    d_c = jnp.take_along_axis(d, idx, axis=1)

    def lerp(p, q, dp, dq):
        # crossing param; denom > 0 on real crossings, guarded for the
        # degenerate slots that the valid mask discards anyway
        den = dp - dq
        den = jnp.where(jnp.abs(den) < 1e-20, 1.0, den)
        s = (dp / den)[:, None]
        return p + (q - p) * s

    a, b, c = tri_c[:, 0], tri_c[:, 1], tri_c[:, 2]
    aa, ab, ac = attr_c[:, 0], attr_c[:, 1], attr_c[:, 2]
    da, db, dc = d_c[:, 0], d_c[:, 1], d_c[:, 2]

    # k==1 (a front): clip edges ab, ac
    p_ab = lerp(a, b, da, db)
    p_ac = lerp(a, c, da, dc)
    a_ab = lerp(aa, ab, da, db)
    a_ac = lerp(aa, ac, da, dc)
    # k==2 (c behind): clip edges bc, ac
    p_bc = lerp(b, c, db, dc)
    a_bc = lerp(ab, ac, db, dc)

    k2 = (k == 2)[:, None, None]
    k3 = (k == 3)[:, None, None]

    tri1 = jnp.where(k3, tri_c,
                     jnp.where(k2, jnp.stack([a, b, p_bc], axis=1),
                               jnp.stack([a, p_ab, p_ac], axis=1)))
    at1 = jnp.where(k3, attr_c,
                    jnp.where(k2, jnp.stack([aa, ab, a_bc], axis=1),
                              jnp.stack([aa, a_ab, a_ac], axis=1)))
    # second output slot: only the k==2 quad split needs it
    tri2 = jnp.stack([a, p_bc, p_ac], axis=1)
    at2 = jnp.stack([aa, a_bc, a_ac], axis=1)

    v1 = k >= 1
    v2 = k == 2
    src = jnp.arange(F, dtype=jnp.int32)
    tri_out = jnp.concatenate([tri1, tri2], axis=0)
    attr_out = jnp.concatenate([at1, at2], axis=0)
    valid = jnp.concatenate([v1, v2], axis=0)
    src_out = jnp.concatenate([src, src], axis=0)
    return tri_out, attr_out, valid, src_out


def _sample_texture_image(texture: jax.Array, u: jax.Array,
                          v: jax.Array) -> jax.Array:
    """Bilinear (H, W) texture lookup, glTF REPEAT wrap, v down from the
    image top. One whole-image gather — texture sampling stays OUT of
    the per-tile loop (row-gather issue rate dominates; see
    docs/ROOFLINE.md) and XLA fuses the weighting into the gather."""
    th, tw = texture.shape[0], texture.shape[1]
    x = u * tw - 0.5
    y = v * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), tw)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, tw)
    y0i = jnp.mod(y0.astype(jnp.int32), th)
    y1i = jnp.mod(y0.astype(jnp.int32) + 1, th)
    c00 = texture[y0i, x0i]
    c01 = texture[y0i, x1i]
    c10 = texture[y1i, x0i]
    c11 = texture[y1i, x1i]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def _composite_tiles_chunked(sel, counts, tri_uv, tri_invz, tri_attr,
                             area, fid_src, tiles_x, ts, chunk):
    """Candidate-chunked per-tile z-buffer: stream each tile's candidate
    list in `chunk`-sized slices, carrying only the per-pixel running
    (depth, winner index); the winning triangle's attributes are
    gathered ONCE per pixel afterwards. Peak memory is O(T*K) int32 for
    the selection matrix + O(chunk) rows per step — never the
    (T, K, 26) float materialization of the unchunked path. Returns
    (T, 8, P) packed tiles."""
    P = ts * ts
    F = tri_uv.shape[0]
    K = sel.shape[1]
    C = min(chunk, K)
    nck = -(-K // C)
    if nck * C != K:
        sel = jnp.pad(sel, ((0, 0), (0, nck * C - K)))
    Adim = tri_attr.shape[-1]
    # one packed row per clipped triangle (gather cost scales with row
    # COUNT, not width — docs/ROOFLINE.md): uv(6) invz(3) area(1)
    # attr(3*Adim) fid(1)
    packed = jnp.concatenate([
        tri_uv.reshape(F, 6), tri_invz, area[:, None],
        tri_attr.reshape(F, 3 * Adim),
        fid_src.astype(jnp.float32)[:, None]], axis=1)

    def empty_tile(_):
        out = jnp.zeros((8, P), jnp.float32)
        out = out.at[3].set(jnp.inf)
        out = out.at[5].set(-1.0)
        return out

    def work(args):
        t_idx, selk, count = args
        ox = (t_idx % tiles_x) * ts
        oy = (t_idx // tiles_x) * ts
        p = jnp.arange(P, dtype=jnp.int32)
        px = (ox + p % ts).astype(jnp.float32)
        py = (oy + p // ts).astype(jnp.float32)
        pxc, pyc = px[:, None], py[:, None]

        def body(carry, ck):
            best_z, best_k = carry
            idx = jax.lax.dynamic_slice(selk, (ck * C,), (C,))
            rows = packed[idx]                                # (C, D)
            ax, ay = rows[None, :, 0], rows[None, :, 1]
            bx, by = rows[None, :, 2], rows[None, :, 3]
            cx_, cy_ = rows[None, :, 4], rows[None, :, 5]
            areac = rows[:, 9]
            inv_area = 1.0 / jnp.where(areac == 0, 1.0, areac)[None, :]
            wa = ((cx_ - bx) * (pyc - by) - (cy_ - by) * (pxc - bx)) * inv_area
            wb = ((ax - cx_) * (pyc - cy_) - (ay - cy_) * (pxc - cx_)) * inv_area
            wc = 1.0 - wa - wb
            kmask = (ck * C + jnp.arange(C, dtype=jnp.int32) < count)[None, :]
            inside = (wa >= 0) & (wb >= 0) & (wc >= 0) & kmask
            invz_p = (wa * rows[None, :, 6] + wb * rows[None, :, 7]
                      + wc * rows[None, :, 8])
            z_p = 1.0 / jnp.maximum(invz_p, 1e-12)
            zm = jnp.where(inside & (invz_p > 0), z_p, jnp.inf)
            cz = jnp.min(zm, axis=1)
            ca = jnp.argmin(zm, axis=1).astype(jnp.int32)
            better = cz < best_z           # strict: earlier chunk wins
            best_z = jnp.where(better, cz, best_z)
            best_k = jnp.where(better, ck * C + ca, best_k)
            return (best_z, best_k), None

        init = (jnp.full((P,), jnp.inf, jnp.float32),
                jnp.zeros((P,), jnp.int32))
        (best_z, best_k), _ = jax.lax.scan(
            body, init, jnp.arange(nck, dtype=jnp.int32))
        hit = jnp.isfinite(best_z)
        gi = selk[best_k]
        rows = packed[gi]                                     # (P, D)
        ax, ay, bx, by, cxr, cyr = (rows[:, i] for i in range(6))
        inv_area = 1.0 / jnp.where(rows[:, 9] == 0, 1.0, rows[:, 9])
        wa = ((cxr - bx) * (py - by) - (cyr - by) * (px - bx)) * inv_area
        wb = ((ax - cxr) * (py - cyr) - (ay - cyr) * (px - cxr)) * inv_area
        wc = 1.0 - wa - wb
        invzb = rows[:, 6:9]
        invz_pix = wa * invzb[:, 0] + wb * invzb[:, 1] + wc * invzb[:, 2]
        wab = jnp.stack([wa, wb, wc], -1)
        attr = rows[:, 10:10 + 3 * Adim].reshape(P, 3, Adim)
        col = jnp.einsum("pi,pia,pi->pa", wab, attr,
                         invzb) / jnp.maximum(invz_pix, 1e-12)[:, None]
        fid = jnp.where(hit, rows[:, -1].astype(jnp.int32), -1)
        col = jnp.where(hit[:, None], col, 0.0)
        depth_out = jnp.where(hit, best_z, jnp.inf)
        return jnp.stack([col[:, 0], col[:, 1], col[:, 2], depth_out,
                          hit.astype(jnp.float32), fid.astype(jnp.float32),
                          col[:, 3], col[:, 4]], 0)

    def one_tile(args):
        _, _, count = args
        return jax.lax.cond(count > 0, work, empty_tile, args)

    T = sel.shape[0]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    return jax.lax.map(one_tile, (t_idx, sel, counts))


def rasterize_mesh(
    vertices: jax.Array,          # (V, 3) world space
    faces: jax.Array,             # (F, 3) int32
    camera: Camera,
    vertex_colors: Optional[jax.Array] = None,   # (V, 3)
    face_colors: Optional[jax.Array] = None,     # (F, 3)
    cfg: MeshRasterConfig = MeshRasterConfig(),
    face_valid: Optional[jax.Array] = None,      # (F,) bool
    vertex_uvs: Optional[jax.Array] = None,      # (V, 2) texcoords
    texture: Optional[jax.Array] = None,         # (Th, Tw, 3) in [0,1]
) -> Dict[str, jax.Array]:
    """Returns rgb (H,W,3), depth (H,W; +inf empty), mask (H,W) bool,
    face_id (H,W) int32 (-1 empty), stats.

    With vertex_uvs + texture, UVs ride the two spare attribute rows
    through the tile loop (perspective-correct like colors) and the
    texture is sampled bilinearly ONCE over the full image outside the
    loop; rgb = interpolated color x texture (glTF base-color
    modulation; the color term defaults to 1 when only a texture is
    given). The textured-scan parity path for the reference's
    trimesh/pyglet viewer (`interactive_segmenter.py:255-381`)."""
    W, H = camera.width, camera.height
    ts = cfg.tile_size
    tiles_x, tiles_y = num_tiles(W, H, ts)
    P = ts * ts

    w2c = camera.w2c
    t = vertices @ w2c[:3, :3].T + w2c[:3, 3]

    f = faces
    tri_cam = t[f]                                   # (F, 3, 3) camera space
    textured = vertex_uvs is not None and texture is not None
    if face_colors is None:
        if vertex_colors is None:
            # white base color under a texture (pure texture look);
            # the legacy light gray otherwise
            vertex_colors = jnp.full_like(
                vertices, 1.0 if textured else 0.7)
        tri_col = vertex_colors[f]                   # (F, 3, 3)
    else:
        tri_col = jnp.broadcast_to(face_colors[:, None, :], (f.shape[0], 3, 3))
    if textured:
        tri_col = jnp.concatenate([tri_col, vertex_uvs[f]], axis=-1)
    else:
        tri_col = jnp.concatenate(
            [tri_col, jnp.zeros(tri_col.shape[:2] + (2,), tri_col.dtype)],
            axis=-1)                                 # (F, 3, 5): rgb + uv

    tri_z_orig = tri_cam[:, :, 2]
    near_straddle = ((tri_z_orig > cfg.near).any(1)
                     & ~(tri_z_orig > cfg.near).all(1))
    src_valid = (jnp.ones((f.shape[0],), bool) if face_valid is None
                 else face_valid)

    if cfg.clip_near:
        # clip straddling triangles against z = near into <=2 pieces
        # (static 2F buffer; slot 2 is degenerate except for quad splits)
        tri_cam, tri_col, clip_valid, src = _clip_near_plane(
            tri_cam, tri_col, cfg.near)
        face_ok = clip_valid & src_valid[src]
        fid_src = src
    else:
        face_ok = (tri_z_orig > cfg.near).all(1) & src_valid
        fid_src = jnp.arange(f.shape[0], dtype=jnp.int32)

    z = tri_cam[:, :, 2]
    z_safe = jnp.where(z > 0.5 * cfg.near, z, 1.0)
    tri_uv = jnp.stack([
        camera.fx * tri_cam[:, :, 0] / z_safe + camera.cx - 0.5,
        camera.fy * tri_cam[:, :, 1] / z_safe + camera.cy - 0.5,
    ], axis=-1)                                      # (F', 3, 2)
    tri_invz = jnp.where(z > 0.5 * cfg.near, 1.0 / z_safe, 0.0)  # (F', 3)

    # signed twice-area in screen space; degenerate triangles dropped
    e1 = tri_uv[:, 1] - tri_uv[:, 0]
    e2 = tri_uv[:, 2] - tri_uv[:, 0]
    area = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    valid = face_ok & (z > 0.5 * cfg.near).all(1) & (jnp.abs(area) > 1e-12)

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

    rank = jnp.arange(tri_uv.shape[0], dtype=jnp.int32)  # z-buffer: order irrelevant
    sel, counts, stats = bin_rects(tx0, ty0, tx1, ty1, rank, valid,
                                   tiles_x, tiles_y, cfg.max_tiles_per_tri,
                                   cfg.tile_capacity)

    if cfg.tri_chunk > 0:
        tiles = _composite_tiles_chunked(
            sel, counts, tri_uv, tri_invz, tri_col, area, fid_src,
            tiles_x, ts, cfg.tri_chunk)
        img = untile(tiles, tiles_x, tiles_y, W, H, ts)  # (H, W, 8)
        mask = img[..., 4] > 0.5
        depth = jnp.where(mask, img[..., 3], jnp.inf)
        rgb = img[..., :3]
        if textured:
            rgb = rgb * _sample_texture_image(texture, img[..., 6],
                                              img[..., 7])
        return {
            "rgb": rgb,
            "depth": depth,
            "mask": mask,
            "face_id": jnp.where(mask, img[..., 5].astype(jnp.int32), -1),
            "stats": stats,
            "near_dropped": (jnp.asarray(0, jnp.int32) if cfg.clip_near
                             else jnp.sum(near_straddle).astype(jnp.int32)),
            "near_clipped": (jnp.sum(near_straddle).astype(jnp.int32)
                             if cfg.clip_near else jnp.asarray(0, jnp.int32)),
        }

    K = cfg.tile_capacity
    g_uv = tri_uv[sel]        # (T, K, 3, 2)
    g_invz = tri_invz[sel]    # (T, K, 3)
    g_col = tri_col[sel]      # (T, K, 3, 3)
    g_area = area[sel]        # (T, K)
    g_fid = jnp.where(
        jnp.arange(K)[None, :] < counts[:, None], fid_src[sel], -1)

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
        # pack into (8, P) rows: r g b depth hit fid u v
        out = jnp.stack([col[:, 0], col[:, 1], col[:, 2], depth_out,
                         hit.astype(jnp.float32), fid.astype(jnp.float32),
                         col[:, 3], col[:, 4]], 0)
        return out

    T = tiles_x * tiles_y
    t_idx = jnp.arange(T, dtype=jnp.int32)
    tiles = jax.lax.map(one_tile, (t_idx, g_uv, g_invz, g_col, g_area, g_fid, counts))
    img = untile(tiles, tiles_x, tiles_y, W, H, ts)  # (H, W, 8)
    mask = img[..., 4] > 0.5
    depth = jnp.where(mask, img[..., 3], jnp.inf)
    rgb = img[..., :3]
    if textured:
        rgb = rgb * _sample_texture_image(texture, img[..., 6], img[..., 7])
    return {
        "rgb": rgb,
        "depth": depth,
        "mask": mask,
        "face_id": jnp.where(mask, img[..., 5].astype(jnp.int32), -1),
        "stats": stats,
        # with clip_near these are CLIPPED (kept), not dropped; the
        # count remains surfaced for the legacy drop mode
        "near_dropped": (jnp.asarray(0, jnp.int32) if cfg.clip_near
                         else jnp.sum(near_straddle).astype(jnp.int32)),
        "near_clipped": (jnp.sum(near_straddle).astype(jnp.int32)
                         if cfg.clip_near else jnp.asarray(0, jnp.int32)),
    }
