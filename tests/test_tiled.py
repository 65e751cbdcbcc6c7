import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.binning import bin_gaussians, gather_tile_features
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import project
from robosimgs_tpu.render.rasterize import rasterize
from robosimgs_tpu.render.tiled import composite_tiled

CFG = RenderConfig(tile_capacity=256, max_tiles_per_gaussian=64, ref_gaussian_chunk=64)


def make_camera(w=64, h=64, dist=4.0):
    return Camera.look_at([dist, 0.3, 0.8], [0, 0, 0], [0, 0, 1], 60.0, w, h)


def make_scene(n=150, seed=0):
    return Gaussians.random(jax.random.PRNGKey(seed), n, sh_degree=1)


def test_binning_covers_all_pairs():
    cam = make_camera(64, 48)
    g = make_scene(100, seed=2)
    proj = project(g, cam, CFG)
    sel, counts, stats = jax.device_get(bin_gaussians(proj, cam.width, cam.height, CFG))
    assert stats.truncated_gaussians == 0
    assert stats.overflowed_tiles == 0
    assert counts.sum() == stats.total_pairs
    # cross-check against brute-force tile bboxes
    from robosimgs_tpu.render.tiles import num_tiles, tile_bbox
    tiles_x, tiles_y = num_tiles(cam.width, cam.height, CFG.tile_size)
    tx0, ty0, tx1, ty1 = jax.device_get(
        tile_bbox(proj.means2d, proj.radii, tiles_x, tiles_y, CFG.tile_size))
    valid = np.asarray(proj.valid)
    depths = np.asarray(proj.depths)
    for t in range(tiles_x * tiles_y):
        tx, ty = t % tiles_x, t // tiles_x
        expected = [i for i in range(100)
                    if valid[i] and tx0[i] <= tx <= tx1[i] and ty0[i] <= ty <= ty1[i]]
        expected.sort(key=lambda i: depths[i])
        got = list(sel[t, :counts[t]])
        assert got == expected, f"tile {t}: {got} != {expected}"


def test_binning_capacity_truncates_farthest():
    cfg = RenderConfig(tile_capacity=4, max_tiles_per_gaussian=64)
    cam = make_camera(16, 16)
    g = make_scene(50, seed=1)
    proj = project(g, cam, cfg)
    sel, counts, stats = jax.device_get(bin_gaussians(proj, cam.width, cam.height, cfg))
    assert (counts <= 4).all()
    depths = np.asarray(proj.depths)
    for t in range(sel.shape[0]):
        d = depths[sel[t, :counts[t]]]
        assert (np.diff(d) >= 0).all()  # front-to-back kept


def test_tiled_jnp_matches_reference():
    cam = make_camera(64, 48)
    g = make_scene(150)
    out_ref = rasterize(g, cam, CFG, impl="reference")
    proj = project(g, cam, CFG)
    out_t = composite_tiled(proj, cam.width, cam.height, CFG, compositor="jnp",
                            return_stats=True)
    assert int(out_t["stats"].overflowed_tiles) == 0
    np.testing.assert_allclose(np.asarray(out_t["rgb"]), np.asarray(out_ref["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t["alpha"]), np.asarray(out_ref["alpha"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t["depth"]), np.asarray(out_ref["depth"]), atol=2e-4)


def test_pallas_fwd_matches_jnp_oracle():
    cam = make_camera(64, 48)
    g = make_scene(150, seed=4)
    proj = project(g, cam, CFG)
    out_j = composite_tiled(proj, cam.width, cam.height, CFG, compositor="jnp")
    out_p = composite_tiled(proj, cam.width, cam.height, CFG, compositor="pallas")
    np.testing.assert_allclose(np.asarray(out_p["rgb"]), np.asarray(out_j["rgb"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p["alpha"]), np.asarray(out_j["alpha"]),
                               atol=1e-5, rtol=1e-5)


def test_pallas_bwd_matches_jnp_autodiff():
    """Hand-derived Pallas VJP vs autodiff of the identical jnp math."""
    cam = make_camera(48, 32)
    g = make_scene(80, seed=5)
    proj = project(g, cam, CFG)
    sel, counts, _ = bin_gaussians(proj, cam.width, cam.height, CFG)
    geom, feat = gather_tile_features(proj, sel, counts, CFG)
    from robosimgs_tpu.render.gathered import composite_gathered
    from robosimgs_tpu.render.pallas_kernels import composite_bwd_pallas
    from robosimgs_tpu.render.tiles import num_tiles
    tiles_x, _ = num_tiles(cam.width, cam.height, CFG.tile_size)

    key = jax.random.PRNGKey(0)
    gout = jax.random.normal(key, (geom.shape[0], 8, CFG.tile_size ** 2))
    # zero cotangent on the unused output rows (5..7) like real losses do
    gout = gout.at[:, 5:, :].set(0.0)

    def f(geom, feat):
        return jnp.vdot(composite_gathered(geom, feat, counts, tiles_x, CFG), gout)

    dgeom_ad, dfeat_ad = jax.grad(f, argnums=(0, 1))(geom, feat)
    dlim = jnp.full((geom.shape[0], CFG.tile_size ** 2, 1), jnp.inf, jnp.float32)
    from robosimgs_tpu.render.pallas_kernels import composite_fwd_pallas
    _, tfin, nblk = composite_fwd_pallas(
        geom, feat, counts, dlim, tiles_x=tiles_x, cfg=CFG, interpret=True)
    dgeom_k, dfeat_k = composite_bwd_pallas(
        geom, feat, counts, dlim, gout, tfin, nblk.reshape(-1),
        tiles_x=tiles_x, cfg=CFG, interpret=True)

    # feature rows 4..7 of feat are synthetic (ones/zeros) — not compared.
    np.testing.assert_allclose(np.asarray(dfeat_k)[:, :4], np.asarray(dfeat_ad)[:, :4],
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dgeom_k)[:, :6], np.asarray(dgeom_ad)[:, :6],
                               atol=1e-4, rtol=1e-3)


def test_tiled_end_to_end_grad_matches_reference():
    """Full-pipeline gradients (through projection) pallas vs reference."""
    cam = make_camera(48, 32)
    g = make_scene(60, seed=6)
    target = jnp.full((32, 48, 3), 0.4)

    names = ["means", "quats", "log_scales", "logit_opacities", "sh_dc"]

    def loss(params, impl, compositor=None):
        gg = g.replace(**params)
        if impl == "reference":
            out = rasterize(gg, cam, CFG, impl="reference")
        else:
            out = composite_tiled(project(gg, cam, CFG), cam.width, cam.height, CFG,
                                  compositor=compositor)
        return jnp.mean((out["rgb"] - target) ** 2)

    params = {k: getattr(g, k) for k in names}
    grads_ref = jax.grad(lambda p: loss(p, "reference"))(params)
    grads_pal = jax.grad(lambda p: loss(p, "tiled", "pallas"))(params)
    for name in names:
        a = np.asarray(grads_ref[name])
        b = np.asarray(grads_pal[name])
        np.testing.assert_allclose(b, a, atol=2e-5, rtol=2e-3, err_msg=name)


def test_chunked_overflow_compositing_exact():
    """tile_capacity is a perf knob, not a quality knob (VERDICT r1 #3):
    a scene whose busiest tile needs ~4x one VMEM chunk must composite
    EXACTLY (values and grads) when streamed in 128-entry chunks with
    carried transmittance, matching both the unchunked pallas path and
    the pure-jnp reference."""
    cfg = RenderConfig(tile_capacity=512, tile_chunk=128,
                       max_tiles_per_gaussian=64, ref_gaussian_chunk=64)
    cfg1 = RenderConfig(tile_capacity=512, max_tiles_per_gaussian=64,
                        ref_gaussian_chunk=64)
    cam = make_camera(32, 32, dist=5.0)
    g = make_scene(400, seed=9)
    proj = project(g, cam, cfg)
    _, _, _, stats = jax.device_get(
        __import__("robosimgs_tpu.render.binning", fromlist=["x"])
        .bin_and_gather_packed(proj, 32, 32, cfg))
    assert int(stats.max_tile_count) > 128, "scene too sparse for the test"

    def render(c, compositor):
        return composite_tiled(project(g, cam, c), 32, 32, c,
                               compositor=compositor)

    out_c = render(cfg, "pallas")
    out_1 = render(cfg1, "pallas")
    out_j = render(cfg1, "jnp")
    np.testing.assert_allclose(np.asarray(out_c["rgb"]),
                               np.asarray(out_1["rgb"]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c["rgb"]),
                               np.asarray(out_j["rgb"]), atol=1e-5, rtol=1e-5)

    # gradients through the chunked path == unchunked == jnp autodiff
    target = jnp.full((32, 32, 3), 0.3)

    def loss(means, c, compositor):
        out = composite_tiled(project(g.replace(means=means), cam, c),
                              32, 32, c, compositor=compositor)
        return jnp.mean((out["rgb"] - target) ** 2)

    g_c = jax.grad(lambda m: loss(m, cfg, "pallas"))(g.means)
    g_j = jax.grad(lambda m: loss(m, cfg1, "jnp"))(g.means)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_j),
                               atol=1e-6, rtol=1e-3)


@pytest.mark.parametrize("wh", [(40, 24), (64, 64)])
def test_tiled_odd_sizes(wh):
    w, h = wh
    cam = make_camera(w, h)
    g = make_scene(80, seed=7)
    proj = project(g, cam, CFG)
    out = composite_tiled(proj, w, h, CFG, compositor="pallas")
    assert out["rgb"].shape == (h, w, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_recommend_capacities():
    from robosimgs_tpu.render.autotune import recommend_capacities
    cam = make_camera(64, 48)
    g = make_scene(100, seed=2)
    cfg = recommend_capacities(g, [cam], CFG)
    assert cfg.tile_capacity % 128 == 0
    assert cfg.max_tiles_per_gaussian % 4 == 0
    # recommended caps must be lossless for the measured view
    from robosimgs_tpu.render.binning import bin_and_gather_packed
    proj = project(g, cam, cfg)
    _, _, counts, stats = bin_and_gather_packed(proj, cam.width, cam.height, cfg)
    assert int(stats.truncated_gaussians) == 0
    assert int(stats.overflowed_tiles) == 0


def test_recommend_capacities_saturation_gate():
    """gate_db: a dense saturated scene gets a much smaller K than the
    full per-tile demand, with the gated render matching the lossless
    one above the gate (the r5 bench convention, productized)."""
    import dataclasses

    import jax

    from robosimgs_tpu.render.autotune import recommend_capacities
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.train.losses import psnr

    cam = Camera.look_at([3.0, 0.3, 0.8], [0, 0, 0], [0, 0, 1], 55.0,
                         96, 96)
    g = Gaussians.random(jax.random.PRNGKey(3), 12000, sh_degree=1,
                         extent=1.0)
    plain = recommend_capacities(g, [cam], CFG)
    gated = recommend_capacities(g, [cam], CFG, gate_db=60.0)
    assert gated.tile_capacity <= plain.tile_capacity
    # M/bbox must be untouched (M-truncation is never gated away)
    assert gated.max_tiles_per_gaussian == plain.max_tiles_per_gaussian
    assert gated.bbox_tiles_per_gaussian == plain.bbox_tiles_per_gaussian
    a = composite_tiled(project(g, cam, gated), 96, 96, gated)["rgb"]
    b = composite_tiled(project(g, cam, plain), 96, 96, plain)["rgb"]
    assert float(psnr(a, b)) > 60.0


def test_absgrad_matches_per_pixel_jacobian():
    """absgrad (RenderConfig.absgrad): the gradient of the abs_probe
    must equal the sum over pixels of the ABSOLUTE per-pixel screen
    gradient — computed here from the reference compositor's full
    jacobian (jacrev rows = true per-pixel cotangent contributions;
    gsplat absgrad semantics)."""
    import jax

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.reference import composite_reference
    from robosimgs_tpu.render.tiled import composite_tiled

    n, W, H = 20, 32, 32
    cfg = RenderConfig(tile_capacity=128, ref_gaussian_chunk=64, absgrad=True)
    cam = Camera.look_at([3.0, 0.4, 0.8], [0, 0, 0], [0, 0, 1], 55.0, W, H)
    g = Gaussians.random(jax.random.PRNGKey(5), n, sh_degree=1)
    wts = jax.random.uniform(jax.random.PRNGKey(6), (H, W, 3))

    def loss_tiled(absp):
        proj = project(g, cam, cfg, abs_probe=absp)
        return jnp.sum(composite_tiled(proj, W, H, cfg)["rgb"] * wts)

    absgrad = jax.grad(loss_tiled)(jnp.zeros((n, 2)))

    def rgb_ref(off):
        proj = project(g, cam, cfg, means2d_offset=off)
        return composite_reference(proj, W, H, cfg)["rgb"]

    J = jax.jacrev(rgb_ref)(jnp.zeros((n, 2)))     # (H, W, 3, n, 2)
    per_px = jnp.einsum("hwc,hwcnk->hwnk", wts, J)
    gt = jnp.sum(jnp.abs(per_px), axis=(0, 1))     # (n, 2)

    assert float(jnp.max(gt)) > 1e-4, "degenerate test scene"
    np.testing.assert_allclose(np.asarray(absgrad), np.asarray(gt),
                               atol=1e-5, rtol=2e-3)
    # absgrad dominates the signed gradient componentwise
    signed = jax.grad(lambda off: jnp.sum(
        composite_tiled(project(g, cam, cfg, means2d_offset=off),
                        W, H, cfg)["rgb"] * wts))(jnp.zeros((n, 2)))
    assert np.all(np.asarray(absgrad) >= np.abs(np.asarray(signed)) - 1e-5)


def test_exact_tile_cull_lossless():
    """Exact ellipse-tile intersection culling removes bbox corner tiles
    where alpha < alpha_min everywhere — entries the kernel keep-mask
    zeroes anyway, so images and gradients must match the un-culled
    binning to f32 reordering noise."""
    import dataclasses

    from robosimgs_tpu.render.binning import bin_and_gather_packed
    from robosimgs_tpu.render.reference import composite_reference

    cam = Camera.look_at([3.5, 0.5, 1.0], [0, 0, 0], [0, 0, 1], 55.0,
                         128, 96)
    g = Gaussians.random(jax.random.PRNGKey(3), 800, sh_degree=2)
    cfg_on = RenderConfig(tile_capacity=512, exact_tile_cull=True)
    cfg_off = dataclasses.replace(cfg_on, exact_tile_cull=False)
    proj = project(g, cam, cfg_on)

    *_, st_on = bin_and_gather_packed(proj, 128, 96, cfg_on)
    *_, st_off = bin_and_gather_packed(proj, 128, 96, cfg_off)
    assert int(st_on.total_pairs) < int(st_off.total_pairs), \
        "cull removed nothing — test scene degenerate"
    assert int(st_on.overflowed_tiles) == 0

    out_on = composite_tiled(proj, 128, 96, cfg_on, compositor="pallas")
    out_off = composite_tiled(proj, 128, 96, cfg_off, compositor="pallas")
    ref = composite_reference(proj, 128, 96, cfg_on)
    np.testing.assert_allclose(np.asarray(out_on["rgb"]),
                               np.asarray(out_off["rgb"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_on["rgb"]),
                               np.asarray(ref["rgb"]), atol=1e-6)

    def loss(means, cfg):
        o = composite_tiled(project(g.replace(means=means), cam, cfg),
                            128, 96, cfg, compositor="pallas")
        return jnp.sum(o["rgb"] ** 2)

    g_on = jax.grad(loss)(g.means, cfg_on)
    g_off = jax.grad(loss)(g.means, cfg_off)
    scale = float(jnp.abs(g_off).max())
    assert float(jnp.abs(g_on - g_off).max()) <= 1e-4 * max(scale, 1.0)

    def loss_ref(means):
        o = composite_reference(project(g.replace(means=means), cam,
                                        cfg_on), 128, 96, cfg_on)
        return jnp.sum(o["rgb"] ** 2)

    g_ref = jax.grad(loss_ref)(g.means)
    assert float(jnp.abs(g_on - g_ref).max()) <= 1e-4 * max(scale, 1.0)


def test_bbox_enumeration_with_survivor_compaction():
    """bbox_tiles_per_gaussian > max_tiles_per_gaussian: enumerate the
    full bbox, cull, row-compact survivors into M slots — lossless when
    M covers the surviving maximum, truncation counted when not."""
    import dataclasses

    from robosimgs_tpu.render.binning import (bin_and_gather_packed,
                                              per_gaussian_cover)
    from robosimgs_tpu.render.reference import composite_reference

    cam = Camera.look_at([3.5, 0.5, 1.0], [0, 0, 0], [0, 0, 1], 55.0,
                         128, 96)
    g = Gaussians.random(jax.random.PRNGKey(9), 1500, sh_degree=1)
    base = RenderConfig(tile_capacity=512, max_tiles_per_gaussian=32)
    proj = project(g, cam, base)
    surv_max = int(per_gaussian_cover(proj, 128, 96, base, 32).max())
    assert surv_max >= 2, "degenerate scene"

    cfg = dataclasses.replace(base, max_tiles_per_gaussian=surv_max,
                              bbox_tiles_per_gaussian=32)
    *_, st = bin_and_gather_packed(proj, 128, 96, cfg)
    assert int(st.truncated_gaussians) == 0
    out = composite_tiled(proj, 128, 96, cfg, compositor="pallas")
    ref = composite_reference(proj, 128, 96, cfg)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=1e-6)

    # under-provisioned M: truncation must be COUNTED, never silent
    cfg_small = dataclasses.replace(cfg,
                                    max_tiles_per_gaussian=surv_max - 1)
    *_, st2 = bin_and_gather_packed(proj, 128, 96, cfg_small)
    assert int(st2.truncated_gaussians) > 0


def test_autotune_recommends_survivor_capacities():
    from robosimgs_tpu.render.autotune import recommend_capacities
    from robosimgs_tpu.render.binning import bin_and_gather_packed

    cam = Camera.look_at([3.5, 0.5, 1.0], [0, 0, 0], [0, 0, 1], 55.0,
                         128, 96)
    g = Gaussians.random(jax.random.PRNGKey(10), 2000, sh_degree=1)
    rec = recommend_capacities(g, [cam])
    proj = project(g, cam, rec)
    *_, st = bin_and_gather_packed(proj, 128, 96, rec)
    assert int(st.truncated_gaussians) == 0
    assert int(st.overflowed_tiles) == 0
    if rec.bbox_tiles_per_gaussian:
        assert rec.bbox_tiles_per_gaussian > rec.max_tiles_per_gaussian


def test_saturated_pixel_gradients_nonzero():
    """Regression: when enough near-opaque splats stack on a pixel, the
    forward's linear transmittance underflows f32 to exactly 0 (the
    saturation semantics). The single-sweep backward must still
    reconstruct per-block transmittance — it reconstructs from the
    forward's LOG-space carry; rebuilding from log(max(T_linear, tiny))
    silently zeroed every gradient on such pixels, front splats
    included."""
    from robosimgs_tpu.render.reference import composite_reference

    n = 64
    g = Gaussians.random(jax.random.PRNGKey(0), n, sh_degree=1)
    means = np.zeros((n, 3), np.float32)
    means[:, 0] = np.linspace(-0.01, 0.01, n)
    g = g.replace(means=jnp.asarray(means),
                  logit_opacities=jnp.full((n,), 6.0))  # alpha ~ 0.9975
    cam = Camera.look_at([2.5, 0, 0], [0, 0, 0], [0, 0, 1], 45.0, 32, 32)
    cfg = RenderConfig(tile_capacity=128)
    proj = project(g, cam, cfg)

    def loss(means, f):
        o = f(project(g.replace(means=means), cam, cfg))
        return jnp.sum(o["rgb"] ** 2)

    gp = jax.grad(loss)(g.means, lambda p: composite_tiled(
        p, 32, 32, cfg, compositor="pallas"))
    gr = jax.grad(loss)(g.means, lambda p: composite_reference(
        p, 32, 32, cfg))
    # the bug mode was gp == 0 exactly while |gr| ~ 0.8
    assert float(jnp.linalg.norm(gp)) > 0.1
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               atol=1e-4, rtol=1e-3)


def test_depth_gradient_parity():
    """Depth supervision rides feature channel 3 through the custom_vjp:
    gradients of a masked alpha-normalized depth L1 through the Pallas
    path must match the reference compositor's autodiff (the contract
    TrainConfig.depth_lambda relies on)."""
    from robosimgs_tpu.render.reference import composite_reference

    cam = make_camera(48, 32)
    g = make_scene(60, seed=9)

    ref0 = composite_reference(project(g, cam, CFG), 48, 32, CFG)
    tgt = jax.lax.stop_gradient(
        ref0["depth"] / jnp.maximum(ref0["alpha"], 1e-6))
    valid = jax.lax.stop_gradient(ref0["alpha"]) > 0.25

    def loss(means, f):
        o = f(project(g.replace(means=means), cam, CFG))
        d = o["depth"] / jnp.maximum(o["alpha"], 1e-6)
        n = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(jnp.where(valid, jnp.abs(d - tgt + 0.05), 0.0)) / n

    gp = jax.grad(loss)(g.means, lambda p: composite_tiled(
        p, 48, 32, CFG, compositor="pallas"))
    gr = jax.grad(loss)(g.means, lambda p: composite_reference(
        p, 48, 32, CFG))
    assert float(jnp.linalg.norm(gr)) > 1e-4  # the loss actually bites
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               atol=2e-5, rtol=2e-3)


def _flat_plane_gaussians(n=64, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-0.8, 0.8, (n, 2)).astype(np.float32)
    means = np.concatenate([xy, np.zeros((n, 1), np.float32)], 1)
    g = Gaussians.from_points(means, colors=np.full((n, 3), 0.6, np.float32),
                              init_scale=np.full((n,), 0.25, np.float32))
    ls = np.array(g.log_scales)
    ls[:, 2] = np.log(1e-3)   # flat along world z -> normal = +/- z
    return g.replace(log_scales=jnp.asarray(ls))


def test_normal_map_flat_plane():
    """render_normals: flat splats on the z=0 world plane viewed from
    +z must composite to the camera-space normal (0, 0, -1) at every
    covered pixel, in both the xyz rows mode and the absgrad
    xy-reconstruction mode (binning.pack16 row contract)."""
    from robosimgs_tpu.render.tiled import composite_tiled

    g = _flat_plane_gaussians()
    cam = Camera.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0], 60.0, 64, 64)
    cfg = RenderConfig(render_normals=True, tile_capacity=256)
    out = composite_tiled(project(g, cam, cfg), 64, 64, cfg)
    m = np.asarray(out["alpha"]) > 0.5
    assert m.sum() > 100
    nm = np.asarray(out["normal"])[m]
    np.testing.assert_allclose(nm, np.tile([0.0, 0.0, -1.0], (len(nm), 1)),
                               atol=1e-4)
    # absgrad owns feat row 7 -> nz reconstructed from nx/ny + alpha
    cfg2 = RenderConfig(render_normals=True, absgrad=True, tile_capacity=256)
    proj2 = project(g, cam, cfg2,
                    abs_probe=jnp.zeros((g.capacity, 2), jnp.float32))
    out2 = composite_tiled(proj2, 64, 64, cfg2)
    np.testing.assert_allclose(np.asarray(out2["normal"])[m], nm, atol=1e-4)


def test_normal_map_oblique_view():
    """Normals are camera-space: tilting the camera tilts the rendered
    normal accordingly (R_cw applied in project)."""
    from robosimgs_tpu.render.tiled import composite_tiled

    g = _flat_plane_gaussians()
    cam = Camera.look_at([2.0, 0, 2.5], [0, 0, 0], [0, 1, 0], 60.0, 64, 64)
    cfg = RenderConfig(render_normals=True, tile_capacity=256)
    out = composite_tiled(project(g, cam, cfg), 64, 64, cfg)
    m = np.asarray(out["alpha"]) > 0.5
    assert m.sum() > 50
    nm = np.asarray(out["normal"])[m]
    # expected: world +z rotated by R_cw, oriented toward camera
    w2c = np.asarray(cam.w2c)
    nz_cam = w2c[:3, :3] @ np.array([0.0, 0.0, 1.0])
    if nz_cam[2] > 0:
        nz_cam = -nz_cam
    err = np.abs(nm - nz_cam[None, :]).max()
    assert err < 1e-3, (err, nm.mean(0), nz_cam)


def test_alpha_mxu_parity_values_and_grads():
    """cfg.alpha_mxu (q as one pixel-moment matmul, docs/NEXT.md top
    perf candidate) must match the per-pixel reference compositor on
    images AND parameter gradients, including under depth-limited
    (mesh-composited) rendering."""
    import dataclasses

    cam = make_camera(64, 48)
    g = make_scene(180, seed=6)
    cfg_mxu = dataclasses.replace(CFG, alpha_mxu=True)

    def loss(means, impl, cfg):
        out = rasterize(g.replace(means=means), cam, cfg, impl=impl,
                        background=jnp.full((3,), 0.3))
        w = jnp.cos(jnp.arange(out["rgb"].size).reshape(out["rgb"].shape))
        return jnp.sum(out["rgb"] * w), out["rgb"]

    (l_m, rgb_m), g_m = jax.value_and_grad(
        lambda m: loss(m, "tiled", cfg_mxu), has_aux=True)(g.means)
    (l_r, rgb_r), g_r = jax.value_and_grad(
        lambda m: loss(m, "reference", CFG), has_aux=True)(g.means)
    np.testing.assert_allclose(np.asarray(rgb_m), np.asarray(rgb_r),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_r),
                               atol=1e-4, rtol=2e-4)

def test_two_tier_binning_exact_and_counted():
    """two_tier_split: the split-tier key sort (tier 1 = everyone's
    first Ms row-sorted slots, tier 2 = top-k widest gaussians' spill
    slots) reproduces the single-sort binning EXACTLY when the spill
    tier holds every gaussian wider than the split; an under-provisioned
    spill tier is counted in BinStats, never silent."""
    import dataclasses

    from robosimgs_tpu.render.binning import bin_and_gather_packed
    from robosimgs_tpu.render.reference import composite_reference

    cam = Camera.look_at([3.5, 0.5, 1.0], [0, 0, 0], [0, 0, 1], 55.0,
                         128, 96)
    g = Gaussians.random(jax.random.PRNGKey(11), 1500, sh_degree=1)
    base = RenderConfig(tile_capacity=512, max_tiles_per_gaussian=24)
    proj = project(g, cam, base)
    geom0, feat0, counts0, st0, sel0 = bin_and_gather_packed(
        proj, 128, 96, base, return_sel=True)

    cfg = dataclasses.replace(base, two_tier_split=4,
                              two_tier_spill_frac=1.0)
    geom1, feat1, counts1, st1, sel1 = bin_and_gather_packed(
        proj, 128, 96, cfg, return_sel=True)
    assert int(st1.truncated_gaussians) == int(st0.truncated_gaussians)
    assert int(st1.total_pairs) == int(st0.total_pairs)
    np.testing.assert_array_equal(np.asarray(counts1), np.asarray(counts0))
    np.testing.assert_array_equal(np.asarray(sel1), np.asarray(sel0))
    np.testing.assert_array_equal(np.asarray(geom1), np.asarray(geom0))
    np.testing.assert_array_equal(np.asarray(feat1), np.asarray(feat0))

    # end-to-end through the pallas compositor vs the jnp reference
    out = composite_tiled(proj, 128, 96, cfg, compositor="pallas")
    ref = composite_reference(proj, 128, 96, cfg)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=1e-6)

    # under-provisioned spill tier (split=1, minimum 128 spill rows for
    # 1500 gaussians): dropped spill pairs must be COUNTED
    cfg_small = dataclasses.replace(base, two_tier_split=1,
                                    two_tier_spill_frac=0.0)
    *_, st2 = bin_and_gather_packed(proj, 128, 96, cfg_small)
    dropped_rows = int(st2.truncated_gaussians) - int(st0.truncated_gaussians)
    dropped_pairs = int(st0.total_pairs) - int(st2.total_pairs)
    assert dropped_rows > 0 and dropped_pairs >= dropped_rows


def test_two_tier_truncated_rows_not_double_counted():
    """A gaussian that BOTH exceeds M survivors and misses the spill
    tier counts ONCE in truncated_gaussians (advisor r3 finding: the
    count-difference formula inflated past n when every wide row was
    also spill-dropped)."""
    import dataclasses

    from robosimgs_tpu.render.binning import (bin_and_gather_packed,
                                              per_gaussian_cover)

    # 200 fat gaussians, every one covering > M tiles: with
    # spill_frac=0 the spill tier holds only 128 rows, so 72 rows are
    # BOTH (surv > M) and spill-dropped
    cam = Camera.look_at([2.0, 0.1, 0.4], [0, 0, 0], [0, 0, 1], 55.0,
                         128, 96)
    g = Gaussians.random(jax.random.PRNGKey(3), 200, sh_degree=0)
    g = g.replace(log_scales=jnp.full_like(g.log_scales, jnp.log(0.25)))
    cfg = RenderConfig(tile_capacity=512, max_tiles_per_gaussian=6,
                       bbox_tiles_per_gaussian=48, two_tier_split=2,
                       two_tier_spill_frac=0.0)
    proj = project(g, cam, cfg)
    surv = np.asarray(per_gaussian_cover(proj, 128, 96, cfg, max_tiles=48))
    valid = np.asarray(proj.valid)
    n_over = int(((surv > 6) & valid).sum())
    assert n_over > 128  # the construction actually over-subscribes
    # all 128 spill seats go to (surv > 6) rows, so every valid row with
    # surv > split(=2) is truncated exactly once
    expected = int(((surv > 2) & valid).sum())
    *_, st = bin_and_gather_packed(proj, 128, 96, cfg)
    assert int(st.truncated_gaussians) == expected
    assert int(st.truncated_gaussians) <= 200
