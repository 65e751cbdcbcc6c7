import numpy as np
import pytest

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.utils.bake import (bake_vertex_colors_from_views,
                                      subdivide_mesh, vertex_normals)
from robosimgs_tpu.utils.meshio import Mesh


def _cube(size=1.0):
    s = size / 2.0
    v = np.array([[-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
                  [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s]], np.float32)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                  [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                  [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int32)
    return Mesh(vertices=v, faces=f)


def test_subdivide_counts_and_surface():
    m = _cube()
    m.vertex_colors = np.random.default_rng(0).uniform(
        size=(8, 3)).astype(np.float32)
    s = subdivide_mesh(m, 2)
    assert s.faces.shape[0] == 12 * 16
    # midpoint subdivision leaves every new vertex ON the original
    # surface: for the cube, max |coord| stays 0.5
    assert np.isclose(np.abs(s.vertices).max(), 0.5, atol=1e-6)
    # edge midpoints are deduplicated: V = 8 + unique edges each round
    assert s.vertices.shape[0] < 12 * 16 * 3
    assert s.vertex_colors.shape == (s.vertices.shape[0], 3)
    # face areas sum preserved
    np.testing.assert_allclose(s.face_areas().sum(), m.face_areas().sum(),
                               rtol=1e-5)


def test_vertex_normals_cube_corners():
    n = vertex_normals(_cube())
    # each cube corner normal points outward (same octant as the vertex)
    v = _cube().vertices
    assert (np.sign(n) == np.sign(v)).mean() > 0.9


def test_bake_recovers_vertex_colors():
    """Render a colored cube from 6 views with the mesh rasterizer
    (unshaded), strip the colors, bake them back from the images:
    visible vertices recover their color."""
    import jax.numpy as jnp

    from robosimgs_tpu.render.mesh_raster import (MeshRasterConfig,
                                                  rasterize_mesh)

    m = subdivide_mesh(_cube(), 1)
    rng = np.random.default_rng(1)
    # smooth-ish colors (bilinear image sampling blends at silhouettes)
    m.vertex_colors = (0.25 + 0.5 * (m.vertices + 0.5)).astype(np.float32)

    dirs = [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
            [0.3, 0.2, 1], [0.3, 0.2, -1]]
    cams, imgs = [], []
    cfg = MeshRasterConfig(tile_capacity=1024, max_tiles_per_tri=512)
    for d in dirs:
        d = np.asarray(d, np.float64)
        eye = d / np.linalg.norm(d) * 3.0
        up = [0, 0, 1] if abs(d[2]) < 0.9 else [0, 1, 0]
        cam = Camera.look_at(eye, [0, 0, 0], up, 45.0, 160, 160)
        out = rasterize_mesh(jnp.asarray(m.vertices), jnp.asarray(m.faces),
                             cam, vertex_colors=jnp.asarray(m.vertex_colors),
                             cfg=cfg)
        img = np.where(np.asarray(out["mask"])[..., None],
                       np.asarray(out["rgb"]), 0.0).astype(np.float32)
        cams.append(cam)
        imgs.append(img)

    colors, seen = bake_vertex_colors_from_views(m, imgs, cams)
    assert seen.mean() > 0.9           # nearly every cube vertex is seen
    err = np.abs(colors[seen] - m.vertex_colors[seen])
    # median error tight; silhouette-edge vertices can blend with the
    # background so judge the bulk, not the max
    assert np.median(err) < 0.02, float(np.median(err))
    assert np.percentile(err, 90) < 0.1, float(np.percentile(err, 90))


def test_bake_raises_on_truncation():
    m = _cube()
    cam = Camera.look_at([2.5, 0.4, 0.6], [0, 0, 0], [0, 0, 1], 45.0,
                         512, 512)
    img = np.zeros((512, 512, 3), np.float32)
    with pytest.raises(ValueError):
        bake_vertex_colors_from_views(m, [img], [cam], max_tiles_per_tri=4)
