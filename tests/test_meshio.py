import numpy as np
import pytest

from robosimgs_tpu.utils.meshio import (Mesh, concatenate, load_mesh,
                                        save_mesh)


@pytest.fixture
def tri_mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [0, 2, 3]], np.int32)
    c = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    return Mesh(vertices=v, faces=f, vertex_colors=c)


@pytest.mark.parametrize("ext", ["glb", "obj", "ply"])
def test_roundtrip(tmp_path, tri_mesh, ext):
    p = str(tmp_path / f"m.{ext}")
    save_mesh(p, tri_mesh)
    m = load_mesh(p)
    np.testing.assert_allclose(m.vertices, tri_mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(m.faces, tri_mesh.faces)
    tol = 1 / 255 + 1e-6 if ext == "ply" else 1e-6
    np.testing.assert_allclose(m.vertex_colors, tri_mesh.vertex_colors, atol=tol)


def test_bounds_center(tri_mesh):
    np.testing.assert_allclose(tri_mesh.bounds, [[0, 0, 0], [1, 1, 1]])
    np.testing.assert_allclose(tri_mesh.center, [0.5, 0.5, 0.5])


def test_translate_transform(tri_mesh):
    t = tri_mesh.translated([1, 2, 3])
    np.testing.assert_allclose(t.vertices[0], [1, 2, 3])
    T = np.eye(4)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]])
    r = tri_mesh.transformed(T)
    np.testing.assert_allclose(r.vertices[1], [0, 1, 0], atol=1e-6)


def test_submesh(tri_mesh):
    sub = tri_mesh.submesh(np.array([True, False, False, True]))
    assert sub.faces.shape == (2, 3)
    assert sub.vertices.shape[0] == 4  # all verts used by faces 0 and 3
    # faces reference valid vertices
    assert sub.faces.max() < sub.vertices.shape[0]


def test_surface_sampling(tri_mesh):
    pts = tri_mesh.sample_surface(500, seed=1)
    assert pts.shape == (500, 3)
    # all samples within bounds
    assert (pts >= -1e-6).all() and (pts <= 1 + 1e-6).all()


def test_concatenate(tri_mesh):
    m2 = concatenate([tri_mesh, tri_mesh.translated([5, 0, 0])])
    assert m2.vertices.shape[0] == 8
    assert m2.faces.shape[0] == 8
    assert m2.faces.max() == 7


def test_face_normals_areas(tri_mesh):
    n = tri_mesh.face_normals()
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)
    a = tri_mesh.face_areas()
    np.testing.assert_allclose(a[0], 0.5, atol=1e-6)


def test_glb_scene_graph_transform(tmp_path, tri_mesh):
    """A GLB with a node translation applies it on load."""
    import json
    import struct
    p = str(tmp_path / "m.glb")
    save_mesh(p, Mesh(tri_mesh.vertices, tri_mesh.faces))
    raw = open(p, "rb").read()
    jlen, jtype = struct.unpack("<II", raw[12:20])
    gltf = json.loads(raw[20:20 + jlen])
    gltf["nodes"][0]["translation"] = [10.0, 0.0, 0.0]
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    rest = raw[20 + jlen:]
    out = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + len(rest))
    out += struct.pack("<II", len(js), 0x4E4F534A) + js + rest
    open(p, "wb").write(out)
    m = load_mesh(p)
    np.testing.assert_allclose(m.vertices[0], [10, 0, 0], atol=1e-6)


def test_reference_glb_outputs_load():
    """Reference part meshes load (behavior-parity artifact check)."""
    import os
    path = "/root/reference/Articulation/openbox_output/parts/body.glb"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    m = load_mesh(path)
    assert m.vertices.shape[0] > 100
    assert m.faces.max() < m.vertices.shape[0]
    assert np.isfinite(m.vertices).all()


def _checker_texture(s=32, c0=(1.0, 0.0, 0.0), c1=(0.0, 0.0, 1.0)):
    """(s, s, 3) checkerboard, 8x8-pixel squares."""
    yy, xx = np.mgrid[0:s, 0:s]
    sel = ((xx // 8 + yy // 8) % 2).astype(bool)
    tex = np.where(sel[..., None], np.asarray(c1, np.float32),
                   np.asarray(c0, np.float32))
    return tex.astype(np.float32)


def _textured_quad():
    """Unit quad in the XY plane with corner-spanning UVs."""
    v = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    f = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return Mesh(vertices=v, faces=f, uv=uv, texture=_checker_texture())


def test_glb_texture_roundtrip(tmp_path):
    m = _textured_quad()
    p = str(tmp_path / "tex.glb")
    save_mesh(p, m)
    m2 = load_mesh(p)
    np.testing.assert_allclose(m2.uv, m.uv, atol=1e-6)
    assert m2.texture is not None and m2.texture.shape == m.texture.shape
    # PNG round-trip is lossless for these exact colors
    np.testing.assert_allclose(m2.texture, m.texture, atol=1 / 255.0)


def test_sample_texture_bilinear_and_wrap():
    from robosimgs_tpu.utils.meshio import sample_texture
    tex = np.zeros((4, 4, 3), np.float32)
    tex[0, 0] = [1.0, 0.0, 0.0]
    # texel centers: uv (0.125, 0.125) hits texel (0,0) exactly
    c = sample_texture(tex, np.asarray([[0.125, 0.125]], np.float32))
    np.testing.assert_allclose(c[0], [1, 0, 0], atol=1e-6)
    # halfway toward the next texel center mixes 50/50
    c = sample_texture(tex, np.asarray([[0.25, 0.125]], np.float32))
    np.testing.assert_allclose(c[0], [0.5, 0, 0], atol=1e-6)
    # REPEAT wrap: uv + 1.0 is identical
    c2 = sample_texture(tex, np.asarray([[1.25, 1.125]], np.float32))
    np.testing.assert_allclose(c2[0], [0.5, 0, 0], atol=1e-6)


def test_baked_vertex_colors_and_colored_sampling():
    m = _textured_quad()
    baked = m.baked_vertex_colors()
    assert baked.shape == (4, 3)
    # corner uv (0,0) REPEAT-wraps: a red/blue edge mix, never green
    assert baked[0, 0] >= 0.4 and baked[0, 1] < 1e-6
    pts, cols = m.sample_surface_colored(256, seed=1)
    assert pts.shape == (256, 3) and cols.shape == (256, 3)
    # both checker colors appear among the samples
    assert (cols[:, 0] > 0.7).any() and (cols[:, 2] > 0.7).any()


def test_submesh_and_concat_preserve_uv():
    m = _textured_quad()
    sub = m.submesh(np.asarray([True, False]))
    assert sub.uv is not None and sub.uv.shape == (3, 2)
    assert sub.texture is m.texture
    # shared texture survives concatenation
    cat = concatenate([m, m.translated([2, 0, 0])])
    assert cat.texture is not None and cat.uv.shape == (8, 2)
    # differing textures are baked to vertex colors
    other = _textured_quad()
    other.texture = _checker_texture(c0=(0, 1, 0), c1=(1, 1, 0))
    cat2 = concatenate([m, other])
    assert cat2.texture is None and cat2.vertex_colors is not None


def test_color_texture_product_semantics():
    """glTF base color: COLOR_0 x baseColorTexture (product), in both
    baked_vertex_colors and sample_surface_colored."""
    m = _textured_quad()
    m.texture = np.ones((4, 4, 3), np.float32)
    m.vertex_colors = np.full((4, 3), 0.5, np.float32)
    np.testing.assert_allclose(m.baked_vertex_colors(),
                               np.full((4, 3), 0.5), atol=1e-6)
    _, cols = m.sample_surface_colored(16, seed=0)
    np.testing.assert_allclose(cols, np.full((16, 3), 0.5), atol=1e-6)
    # colorless part joined with a texture-sharing colored part renders
    # with a WHITE fill (texture-only look), not 0.7 gray
    other = Mesh(vertices=m.vertices + 2.0, faces=m.faces, uv=m.uv,
                 texture=m.texture)
    cat = concatenate([m, other])
    assert cat.texture is not None
    np.testing.assert_allclose(cat.vertex_colors[4:], 1.0, atol=1e-6)
