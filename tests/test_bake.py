import numpy as np
import pytest

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.utils.bake import (bake_appearance_from_views,
                                      bake_vertex_colors_from_views,
                                      eval_baked_colors, subdivide_mesh,
                                      vertex_normals)
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


_VIEW_DIRS = [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
              [0.3, 0.2, 1], [0.3, 0.2, -1]]


def _render_views(m, per_view_colors, dirs=None):
    """Rasterize the mesh once per view direction; per_view_colors maps
    view index -> (V, 3) vertex colors for that view (view-dependent
    appearance is emulated by re-coloring per view)."""
    import jax.numpy as jnp

    from robosimgs_tpu.render.mesh_raster import (MeshRasterConfig,
                                                  rasterize_mesh)

    cams, imgs = [], []
    cfg = MeshRasterConfig(tile_capacity=1024, max_tiles_per_tri=512)
    for i, d in enumerate(dirs if dirs is not None else _VIEW_DIRS):
        d = np.asarray(d, np.float64)
        eye = d / np.linalg.norm(d) * 3.0
        up = [0, 0, 1] if abs(d[2]) < 0.9 else [0, 1, 0]
        cam = Camera.look_at(eye, [0, 0, 0], up, 45.0, 160, 160)
        out = rasterize_mesh(
            jnp.asarray(m.vertices), jnp.asarray(m.faces), cam,
            vertex_colors=jnp.asarray(per_view_colors(i, cam)), cfg=cfg)
        img = np.where(np.asarray(out["mask"])[..., None],
                       np.asarray(out["rgb"]), 0.0).astype(np.float32)
        cams.append(cam)
        imgs.append(img)
    return cams, imgs


def test_bake_exposure_solve_removes_view_disagreement():
    """Corrupt each view with a different affine exposure: the solve
    recovers per-view gains (up to the pinned global gauge) and the
    exposure-corrected bake lands closer to truth than the plain one."""
    m = subdivide_mesh(_cube(), 1)
    # non-axis-aligned smooth field: every channel varies on every cube
    # face, so each view constrains all three per-channel gains (an
    # axis-aligned field leaves a view's facing channel constant and
    # its gain unidentifiable)
    x, y, z = m.vertices.T
    truth = np.stack([0.3 + 0.2 * (x + y + 1.0),
                      0.3 + 0.2 * (y + z + 1.0),
                      0.3 + 0.2 * (z - x + 1.0)], 1).astype(np.float32)
    rng = np.random.default_rng(3)
    gains = (1.0 + rng.uniform(-0.2, 0.2, size=(6, 3))).astype(np.float32)
    biases = rng.uniform(-0.05, 0.05, size=(6, 3)).astype(np.float32)
    cams, imgs = _render_views(m, lambda i, cam: truth)
    imgs = [g * im + b for im, g, b in          # no clipping (range < 0.9)
            zip(imgs, gains[:, None, None, :], biases[:, None, None, :])]

    plain, seen = bake_vertex_colors_from_views(m, imgs, cams)
    baked = bake_appearance_from_views(m, imgs, cams, degree=0)

    def gauge_err(est):
        """Residual after the best single global affine per channel —
        exposure is only recoverable up to one global gain/bias, and
        view-subset inconsistency is exactly what no global affine can
        remove from the plain bake."""
        e, t = est[seen].astype(np.float64), truth[seen].astype(np.float64)
        resid = np.empty_like(e)
        for c in range(3):
            a, b = np.polyfit(e[:, c], t[:, c], 1)
            resid[:, c] = a * e[:, c] + b - t[:, c]
        return np.median(np.abs(resid))

    err_plain = gauge_err(plain)
    err_solved = gauge_err(baked.sh0)
    assert err_solved < 0.5 * err_plain, (err_solved, err_plain)
    assert err_solved < 0.01, err_solved
    # the solve's objective, asserted directly: per-vertex cross-view
    # disagreement of the CORRECTED observations collapses vs the raw
    # ones (per-view gain/bias alone are not identifiable — they trade
    # off over each view's observed color range)
    from robosimgs_tpu.utils.bake import _collect_view_samples
    cols, wts, _ = _collect_view_samples(m, imgs, cams, 0.01, 0.15,
                                         1024, 512, 0)
    w = wts * ((wts > 0).sum(0) >= 2)[None, :]

    def disagreement(c):
        mu = np.einsum("nv,nvc->vc", w, c) / np.clip(
            w.sum(0)[:, None], 1e-12, None)
        var = np.einsum("nv,nvc->vc", w, (c - mu[None]) ** 2) / np.clip(
            w.sum(0)[:, None], 1e-12, None)
        return float(np.median(var[w.sum(0) > 0]))

    raw = disagreement(cols)
    corrected = disagreement(
        baked.view_gain[:, None, :] * cols + baked.view_bias[:, None, :])
    assert corrected < 0.25 * raw, (corrected, raw)


def test_bake_degree1_recovers_view_dependence():
    """Ground-truth appearance with a linear directional term (the
    degree-1 function space): the directional bake predicts a NOVEL
    view's vertex colors better than the diffuse bake."""
    m = subdivide_mesh(_cube(), 2)
    rng = np.random.default_rng(5)
    base = (0.35 + 0.3 * (m.vertices + 0.5)).astype(np.float32)
    D = rng.uniform(-0.1, 0.1, size=(m.vertices.shape[0], 3, 3)).astype(
        np.float32)                      # [vertex, dir, channel]

    def colors_for(i, cam):
        d = np.asarray(cam.origin, np.float32)[None, :] - m.vertices
        d /= np.clip(np.linalg.norm(d, axis=1, keepdims=True), 1e-12, None)
        return np.clip(base + np.einsum("vic,vi->vc", D, d), 0, 1)

    # axis views + diagonals: enough directional span that face-interior
    # vertices collect >= 3 observed directions for the 3-parameter fit
    view_dirs = _VIEW_DIRS + [[1, 1, 0.6], [-1, 1, 0.6], [1, -1, 0.6],
                              [-1, -1, 0.6]]
    cams, imgs = _render_views(m, colors_for, dirs=view_dirs)
    b0 = bake_appearance_from_views(m, imgs, cams, exposure=False, degree=0)
    b1 = bake_appearance_from_views(m, imgs, cams, exposure=False, degree=1,
                                    dir_reg=0.1)
    from robosimgs_tpu.utils.bake import _collect_view_samples
    _, wts, _ = _collect_view_samples(m, imgs, cams, 0.01, 0.15, 1024, 512, 0)
    well = (wts > 0).sum(0) >= 3         # fit is determined here
    assert well.mean() > 0.3, well.mean()
    novel_eye = np.asarray([1.0, 0.6, 1.0])
    novel_eye = novel_eye / np.linalg.norm(novel_eye) * 3.0
    d = novel_eye[None, :] - m.vertices
    d /= np.clip(np.linalg.norm(d, axis=1, keepdims=True), 1e-12, None)
    truth = np.clip(base + np.einsum("vic,vi->vc", D, d), 0, 1)
    e0 = np.median(np.abs(eval_baked_colors(b0, m.vertices, novel_eye)[well]
                          - truth[well]))
    e1 = np.median(np.abs(eval_baked_colors(b1, m.vertices, novel_eye)[well]
                          - truth[well]))
    assert e1 < 0.7 * e0, (e1, e0)
    assert e1 < 0.03, e1


def test_bake_appearance_single_view_identity_exposure():
    m = subdivide_mesh(_cube(), 1)
    truth = (0.25 + 0.5 * (m.vertices + 0.5)).astype(np.float32)
    cams, imgs = _render_views(m, lambda i, cam: truth)
    baked = bake_appearance_from_views(m, imgs[:1], cams[:1])
    np.testing.assert_array_equal(baked.view_gain, 1.0)
    np.testing.assert_array_equal(baked.view_bias, 0.0)
    np.testing.assert_array_equal(baked.dir1, 0.0)  # needs >= 2 views
    # degenerate single view still produces a usable diffuse bake
    assert baked.seen.any()


def test_exposure_solve_identity_without_overlap():
    """Disjoint visibility (no vertex seen by >= 2 views) gives the
    solve nothing to align: it must return identity, not divide by the
    empty gauge (regression: gains exploded to ~1e6)."""
    from robosimgs_tpu.utils.bake import _solve_view_exposure
    rng = np.random.default_rng(7)
    cols = rng.uniform(0.2, 0.8, size=(2, 40, 3)).astype(np.float32)
    wts = np.zeros((2, 40), np.float32)
    wts[0, :20] = 1.0
    wts[1, 20:] = 1.0
    g, b = _solve_view_exposure(cols, wts)
    np.testing.assert_array_equal(g, 1.0)
    np.testing.assert_array_equal(b, 0.0)


def test_bake_raises_on_truncation():
    m = _cube()
    cam = Camera.look_at([2.5, 0.4, 0.6], [0, 0, 0], [0, 0, 1], 45.0,
                         512, 512)
    img = np.zeros((512, 512, 3), np.float32)
    with pytest.raises(ValueError):
        bake_vertex_colors_from_views(m, [img], [cam], max_tiles_per_tri=4)
