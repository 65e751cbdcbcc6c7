import jax
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.compose import render_composite
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.mesh_raster import MeshRasterConfig, rasterize_mesh
from robosimgs_tpu.render.rasterize import rasterize


def unit_quad(z=0.0, size=1.0, color=(1.0, 0.0, 0.0)):
    """Two triangles spanning [-s,s]^2 in the plane x=z (facing +x)."""
    s = size
    verts = np.array([[z, -s, -s], [z, s, -s], [z, s, s], [z, -s, s]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    cols = np.tile(np.asarray(color, np.float32), (4, 1))
    return jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(cols)


def cam(w=64, h=64, dist=4.0):
    return Camera.look_at([dist, 0, 0], [0, 0, 0], [0, 0, 1], 60.0, w, h)


def test_quad_covers_center():
    v, f, c = unit_quad(size=0.8)
    out = rasterize_mesh(v, f, cam(), vertex_colors=c)
    m = np.asarray(out["mask"])
    assert m[32, 32]
    assert not m[2, 2]  # corner outside quad
    np.testing.assert_allclose(np.asarray(out["rgb"])[32, 32], [1, 0, 0], atol=1e-5)
    # depth at center = distance 4
    np.testing.assert_allclose(np.asarray(out["depth"])[32, 32], 4.0, atol=1e-3)


def test_zbuffer_nearest_wins():
    v1, f1, c1 = unit_quad(z=0.0, size=0.8, color=(1, 0, 0))
    v2, f2, c2 = unit_quad(z=1.0, size=0.4, color=(0, 1, 0))  # closer to cam at +4
    v = jnp.concatenate([v1, v2])
    f = jnp.concatenate([f1, f2 + 4])
    c = jnp.concatenate([c1, c2])
    out = rasterize_mesh(v, f, cam(), vertex_colors=c)
    rgb = np.asarray(out["rgb"])
    np.testing.assert_allclose(rgb[32, 32], [0, 1, 0], atol=1e-5)   # center: near quad
    np.testing.assert_allclose(rgb[32, 22], [1, 0, 0], atol=1e-5)   # ring: far quad only
    d = np.asarray(out["depth"])
    assert d[32, 32] < d[32, 22]


def test_face_id_map():
    v, f, c = unit_quad(size=0.8)
    out = rasterize_mesh(v, f, cam(), vertex_colors=c)
    fid = np.asarray(out["face_id"])
    hits = np.unique(fid[fid >= 0])
    assert set(hits) == {0, 1}
    assert (fid[~np.asarray(out["mask"])] == -1).all()


def test_perspective_depth_interpolation():
    # slanted quad: depth varies across the surface
    verts = jnp.asarray(np.array(
        [[0.5, -1, -1], [-0.5, 1, -1], [-0.5, 1, 1], [0.5, -1, 1]], np.float32))
    faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    out = rasterize_mesh(verts, faces, cam())
    d = np.asarray(out["depth"])
    # left side of image (negative y in world seen from +x cam... check monotone)
    row = d[32, 22:42]
    assert np.isfinite(row).all()
    assert (np.diff(row) > 0).all() or (np.diff(row) < 0).all()


def test_composite_mesh_occludes_gaussians():
    g = Gaussians.from_points(
        np.array([[-0.5, 0, 0]], np.float32),        # behind the quad
        np.array([[0, 0, 1]], np.float32), sh_degree=0,
        init_scale=np.array([0.3], np.float32))
    g = g.replace(logit_opacities=jnp.full((1,), 10.0))
    v, f, c = unit_quad(z=0.0, size=0.6, color=(1, 0, 0))
    out = render_composite(g, cam(), [(v, f, c)], impl="reference")
    rgb = np.asarray(out["rgb"])
    # center: mesh in front -> red, gaussian hidden
    np.testing.assert_allclose(rgb[32, 32], [1, 0, 0], atol=1e-4)


def test_composite_gaussian_in_front_of_mesh():
    g = Gaussians.from_points(
        np.array([[0.5, 0, 0]], np.float32),         # in front of quad
        np.array([[0, 0, 1]], np.float32), sh_degree=0,
        init_scale=np.array([0.2], np.float32))
    g = g.replace(logit_opacities=jnp.full((1,), 10.0))
    v, f, c = unit_quad(z=0.0, size=0.8, color=(1, 0, 0))
    out = render_composite(g, cam(), [(v, f, c)], impl="reference")
    rgb = np.asarray(out["rgb"])
    assert rgb[32, 32, 2] > 0.5          # blue gaussian visible at center
    # ring pixel: mostly mesh red with a faint gaussian tail
    assert rgb[32, 24, 0] > 0.9 and rgb[32, 24, 1] < 1e-6


def test_composite_background_passthrough():
    g = Gaussians.random(jax.random.PRNGKey(0), 5, sh_degree=0)
    g = g.replace(alive=jnp.zeros_like(g.alive))
    out = render_composite(g, cam(32, 32), [], background=jnp.asarray([0.1, 0.2, 0.3]),
                           impl="reference")
    np.testing.assert_allclose(np.asarray(out["rgb"])[0, 0], [0.1, 0.2, 0.3], atol=1e-6)


def test_depth_limit_consistency_tiled_vs_reference():
    key = jax.random.PRNGKey(2)
    g = Gaussians.random(key, 80, sh_degree=1)
    c = cam(48, 48)
    v, f, col = unit_quad(z=0.0, size=0.5, color=(0.5, 0.5, 0.5))
    cfg = RenderConfig(tile_capacity=128, max_tiles_per_gaussian=64)
    out_ref = render_composite(g, c, [(v, f, col)], cfg, impl="reference")
    out_til = render_composite(g, c, [(v, f, col)], cfg, impl="tiled")
    np.testing.assert_allclose(np.asarray(out_til["rgb"]), np.asarray(out_ref["rgb"]),
                               atol=1e-5)


def test_mesh_raster_grad_vertices():
    """Vertex positions are differentiable through the raster (colors via
    barycentric weights)."""
    v, f, c = unit_quad(size=0.8)

    def loss(verts):
        out = rasterize_mesh(verts, f, cam(32, 32), vertex_colors=c)
        return jnp.sum(out["rgb"])

    gr = jax.grad(loss)(v)
    assert np.isfinite(np.asarray(gr)).all()


def test_near_plane_clipping():
    """Triangles straddling the near plane are clipped into sub-
    triangles (clip_near=True, default) instead of dropped whole — the
    close-up surface must not vanish face-by-face (ADVICE r1)."""
    import dataclasses
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_scenegen import box_mesh

    mesh = box_mesh((0.6, 0.6, 0.25))
    colors = np.tile(np.array([[0.8, 0.4, 0.2]], np.float32),
                     (len(mesh.vertices), 1))
    cam = Camera.look_at([0.65, 0.0, 0.1], [-1.0, 0, 0.0], [0, 0, 1],
                         70.0, 96, 96)
    cfg_clip = MeshRasterConfig(tile_capacity=256, near=0.05)
    cfg_drop = dataclasses.replace(cfg_clip, clip_near=False)
    out_c = rasterize_mesh(jnp.asarray(mesh.vertices),
                           jnp.asarray(mesh.faces), cam,
                           vertex_colors=jnp.asarray(colors), cfg=cfg_clip)
    out_d = rasterize_mesh(jnp.asarray(mesh.vertices),
                           jnp.asarray(mesh.faces), cam,
                           vertex_colors=jnp.asarray(colors), cfg=cfg_drop)
    m_c = np.asarray(out_c["mask"])
    m_d = np.asarray(out_d["mask"])
    assert int(out_c["near_clipped"]) > 0
    assert int(out_d["near_dropped"]) > 0
    # clipping strictly recovers coverage the drop mode lost
    assert m_c.sum() > m_d.sum() * 1.5
    assert (m_c | m_d).sum() == m_c.sum()   # superset
    # clipped geometry reaches the near plane (drop mode starts much
    # deeper — the close faces vanished)
    d_c = np.asarray(out_c["depth"])[m_c]
    assert d_c.min() < 0.06
    # where both hit the SAME face, colors and depths agree
    both = m_c & m_d
    same = (np.asarray(out_c["face_id"]) == np.asarray(out_d["face_id"])) & both
    assert same.sum() > 100
    np.testing.assert_allclose(np.asarray(out_c["rgb"])[same],
                               np.asarray(out_d["rgb"])[same], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c["depth"])[same],
                               np.asarray(out_d["depth"])[same], rtol=1e-5)


def test_textured_quad_orientation_and_values():
    """UV-textured raster: a 2x2 four-color texture on a quad facing the
    camera lands each color in the correct image quadrant (perspective-
    correct interpolation + glTF v-down convention), exactly at texel
    centers."""
    v, f, _ = unit_quad(size=0.8)
    # texture: row 0 (v=0, TOP) = [red | green], row 1 = [blue | white]
    tex = jnp.asarray(np.array(
        [[[1, 0, 0], [0, 1, 0]],
         [[0, 0, 1], [1, 1, 1]]], np.float32))
    # quad verts (x=0 plane), (y, z) = [-s,-s],[s,-s],[s,s],[-s,s].
    # This camera maps image-right = +y world, image-up = +z world
    # (probed empirically), so the image corners are: top-left =
    # vert 3 (-s,+s), top-right = vert 2 (+s,+s), bottom-right =
    # vert 1 (+s,-s), bottom-left = vert 0 (-s,-s). uv(0,0) is the
    # texture's top-left (red).
    uv = jnp.asarray(np.array(
        [[0, 1], [1, 1], [1, 0], [0, 0]], np.float32))
    out = rasterize_mesh(v, f, cam(), vertex_uvs=uv, texture=tex)
    rgb = np.asarray(out["rgb"])
    mask = np.asarray(out["mask"])
    assert mask[32, 32]
    # sample inside each quadrant, at pixels well inside the quad
    tl, tr = rgb[26, 26], rgb[26, 38]
    bl, br = rgb[38, 26], rgb[38, 38]
    assert mask[26, 26] and mask[38, 38]
    np.testing.assert_allclose(tl, [1, 0, 0], atol=0.2)   # red
    np.testing.assert_allclose(tr, [0, 1, 0], atol=0.2)   # green
    np.testing.assert_allclose(bl, [0, 0, 1], atol=0.2)   # blue
    np.testing.assert_allclose(br, [1, 1, 1], atol=0.2)   # white


def test_textured_modulates_vertex_colors():
    """texture x interpolated color: a 0.5-gray color scales the texture."""
    v, f, _ = unit_quad(size=0.8)
    tex = jnp.ones((4, 4, 3), jnp.float32)
    uv = jnp.asarray(np.full((4, 2), 0.5, np.float32))
    half = jnp.full((4, 3), 0.5, jnp.float32)
    out = rasterize_mesh(v, f, cam(), vertex_colors=half,
                         vertex_uvs=uv, texture=tex)
    np.testing.assert_allclose(np.asarray(out["rgb"])[32, 32], [0.5] * 3,
                               atol=1e-5)


def test_textured_near_clip_keeps_uv():
    """UVs survive near-plane clipping (the clipper interpolates the
    full attribute vector): a straddling textured quad still shows the
    texture, not garbage."""
    tex = jnp.asarray(np.array(
        [[[1, 0, 0], [0, 1, 0]],
         [[0, 0, 1], [1, 1, 1]]], np.float32))
    # quad straddling the near plane: camera at +4 looking -x, quad
    # plane x = 3.995+ spans in front/behind z=near
    verts = np.array([[6.0, -1, -1], [0.0, 1, -1], [0.0, 1, 1],
                      [6.0, -1, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    out = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces),
                         cam(dist=4.0), vertex_uvs=jnp.asarray(uv),
                         texture=tex)
    rgb = np.asarray(out["rgb"])
    mask = np.asarray(out["mask"])
    assert int(out["near_clipped"]) > 0
    assert mask.any()
    vals = rgb[mask]
    assert np.isfinite(vals).all()
    assert (vals >= -1e-5).all() and (vals <= 1 + 1e-5).all()


def test_tri_chunk_parity():
    """Candidate-chunked z-buffering is EXACT vs the unchunked path
    (same depths, colors, face ids), including when counts span
    multiple chunks and K is not a chunk multiple."""
    import dataclasses

    rng = np.random.default_rng(7)
    nb = 30
    vs, fs, cs = [], [], []
    off = 0
    for i in range(nb):
        c = rng.uniform(-0.7, 0.7, 3).astype(np.float32)
        s = rng.uniform(0.1, 0.5)
        v = (rng.uniform(-1, 1, (4, 3)) * s + c).astype(np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]], np.int32)
        vs.append(v)
        fs.append(f + off)
        cs.append(np.tile(rng.uniform(0.1, 1.0, 3).astype(np.float32),
                          (4, 1)))
        off += 4
    v = jnp.asarray(np.concatenate(vs))
    f = jnp.asarray(np.concatenate(fs))
    c = jnp.asarray(np.concatenate(cs))
    camera = cam(w=96, h=64, dist=3.0)
    base = MeshRasterConfig(tile_capacity=96, max_tiles_per_tri=64)
    out0 = rasterize_mesh(v, f, camera, vertex_colors=c, cfg=base)
    assert int(out0["stats"].overflowed_tiles) == 0
    assert int(jnp.max(out0["stats"].max_tile_count)) > 40  # multi-chunk
    for chunk in (32, 40, 96):
        cfgc = dataclasses.replace(base, tri_chunk=chunk)
        outc = rasterize_mesh(v, f, camera, vertex_colors=c, cfg=cfgc)
        np.testing.assert_allclose(np.asarray(outc["rgb"]),
                                   np.asarray(out0["rgb"]),
                                   rtol=1e-5, atol=1e-5)
        d0 = np.asarray(out0["depth"])
        dc = np.asarray(outc["depth"])
        m = np.asarray(out0["mask"])
        assert (np.asarray(outc["mask"]) == m).all()
        np.testing.assert_allclose(dc[m], d0[m], rtol=1e-5)
        assert (np.asarray(outc["face_id"]) == np.asarray(out0["face_id"])).all()


def test_tri_chunk_textured_parity():
    import dataclasses
    v, f, _ = unit_quad(size=0.8)
    tex = jnp.asarray(np.array(
        [[[1, 0, 0], [0, 1, 0]],
         [[0, 0, 1], [1, 1, 1]]], np.float32))
    uv = jnp.asarray(np.array(
        [[0, 1], [1, 1], [1, 0], [0, 0]], np.float32))
    base = MeshRasterConfig(tile_capacity=64)
    # camera nudged off axis so no pixel center lands EXACTLY on a
    # triangle edge (knife-edge pixels flip with XLA fusion rounding)
    camera = Camera.look_at([3.97, 0.013, 0.021], [0, 0, 0], [0, 0, 1],
                            60.0, 64, 64)
    out0 = rasterize_mesh(v, f, camera, vertex_uvs=uv, texture=tex, cfg=base)
    outc = rasterize_mesh(v, f, camera, vertex_uvs=uv, texture=tex,
                          cfg=dataclasses.replace(base, tri_chunk=16))
    np.testing.assert_allclose(np.asarray(outc["rgb"]),
                               np.asarray(out0["rgb"]), atol=1e-5)
