"""Ring-streamed gaussian-sharded compositing (parallel/ring.py).

Validates the beyond-HBM path (SURVEY.md §2.3 SP/CP row, §5
long-context analog): outputs and gradients must match the all_gather
path exactly, and the lowered program must contain collective-permutes
but NO all-gather of the gaussian set (the structural proof that
per-device memory stays O(N/n_shard))."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.parallel.mesh import make_mesh
from robosimgs_tpu.parallel.ring import ring_bin_gather
from robosimgs_tpu.render.binning import bin_and_gather_packed
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import project
from robosimgs_tpu.train.optim import float_params


def _setup(n=64, wh=(32, 32), seed=3):
    cfg = RenderConfig(tile_capacity=128, ref_gaussian_chunk=64)
    from robosimgs_tpu.train.data import synthetic_scene
    _, frames = synthetic_scene(seed=seed, n_gaussians=8, n_cameras=1,
                                width=wh[0], height=wh[1], sh_degree=1)
    g = Gaussians.random(jax.random.PRNGKey(seed), n, sh_degree=1)
    return cfg, frames[0].camera, g


def _ring_fn(mesh, cam, cfg, n_shard, n_tile):
    rows = cam.height // n_tile

    def per_device(params, alive, offset):
        tile_rank = jax.lax.axis_index("tile")
        crop = dataclasses.replace(cam, cy=cam.cy - tile_rank * rows,
                                   height=rows)
        geom, feat, counts, _stats, radii, valid = ring_bin_gather(
            params, alive, offset, (crop, cam.tan_half_fov),
            cam.width, rows, cfg, "data", n_shard)
        return geom, feat, counts, radii, valid

    pspec = {k: P("data") for k in
             ["means", "quats", "log_scales", "logit_opacities",
              "sh_dc", "sh_rest"]}
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(pspec, P("data"), P("data")),
        out_specs=(P("tile"), P("tile"), P("tile"),
                   P(("tile", "data")), P(("tile", "data"))),
        check_vma=False))


def test_ring_bin_gather_matches_full_binning():
    """Forward parity: the ring-merged per-tile blocks equal the
    full-set binning of the all-gathered projection, bit for bit."""
    assert len(jax.devices()) >= 8
    n_shard, n_tile = 4, 2
    mesh = make_mesh(n_shard, n_tile)
    cfg, cam, g = _setup(n=64)
    params = float_params(g)
    offset = jnp.zeros((g.capacity, 2), jnp.float32)

    fn = _ring_fn(mesh, cam, cfg, n_shard, n_tile)
    geom_r, feat_r, counts_r, radii_r, valid_r = fn(params, g.alive, offset)

    # reference: bin the FULL set per tile strip
    rows = cam.height // n_tile
    geoms, feats, counts, radiis, valids = [], [], [], [], []
    for r in range(n_tile):
        crop = dataclasses.replace(cam, cy=cam.cy - r * rows, height=rows)
        proj = project(g, crop, cfg, means2d_offset=offset,
                       tan_half_fov=cam.tan_half_fov)
        ge, fe, ct, st = bin_and_gather_packed(proj, cam.width, rows, cfg)
        geoms.append(ge); feats.append(fe); counts.append(ct)
        radiis.append(proj.radii); valids.append(proj.valid)
    geom_f = jnp.concatenate(geoms)
    feat_f = jnp.concatenate(feats)
    counts_f = jnp.concatenate(counts)

    np.testing.assert_array_equal(np.asarray(counts_r), np.asarray(counts_f))
    # the hop-0 densify side channel equals a direct local projection
    # (tile-major, data-minor layout matches concat of full projections)
    np.testing.assert_allclose(np.asarray(radii_r),
                               np.asarray(jnp.concatenate(radiis)),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid_r),
                                  np.asarray(jnp.concatenate(valids)))
    # compare only the valid (within-count) slots: padding slots are
    # inert (opacity 0) but may hold different residual rows. Chunked
    # vs full-set projection compiles to different shapes, so XLA's
    # reassociation leaves ~1e-6 float noise — tight allclose, not
    # bitwise.
    K = cfg.tile_capacity
    kmask = np.arange(K)[None, :] < np.asarray(counts_f)[:, None]
    for a, b, name in [(geom_r, geom_f, "geom"), (feat_r, feat_f, "feat")]:
        a = np.asarray(a); b = np.asarray(b)
        np.testing.assert_allclose(
            np.where(kmask[:, None, :], a, 0.0),
            np.where(kmask[:, None, :], b, 0.0),
            atol=1e-5, rtol=1e-4, err_msg=name)


def test_ring_lowering_has_no_all_gather():
    """The structural memory claim: the lowered ring program rotates
    shards with collective-permute and never all-gathers them."""
    assert len(jax.devices()) >= 8
    n_shard, n_tile = 4, 2
    mesh = make_mesh(n_shard, n_tile)
    cfg, cam, g = _setup(n=64)
    params = float_params(g)
    offset = jnp.zeros((g.capacity, 2), jnp.float32)
    fn = _ring_fn(mesh, cam, cfg, n_shard, n_tile)
    hlo = fn.lower(params, g.alive, offset).compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_ring_step_matches_all_gather_step():
    """Full sharded train step with gather='ring' vs gather='all_gather':
    loss and per-shard gradients must agree."""
    from robosimgs_tpu.parallel.distributed import \
        make_gaussian_sharded_train_step
    from tests.test_dist import setup

    cfg, frames, targets, state, _ = setup(n_cams=1)
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])

    results = {}
    for gather in ["all_gather", "ring"]:
        st = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
        step_fn = make_gaussian_sharded_train_step(
            cfg, mesh, impl="tiled", return_grads=True, gather=gather)
        new_state, metrics = step_fn(st, frames[0].camera,
                                     jnp.asarray(targets[0]))
        results[gather] = (float(metrics["loss"]), metrics["grads"],
                          int(new_state.step))

    loss_ag, grads_ag, _ = results["all_gather"]
    loss_ring, grads_ring, step_ring = results["ring"]
    np.testing.assert_allclose(loss_ring, loss_ag, rtol=1e-6)
    for k in grads_ag:
        np.testing.assert_allclose(np.asarray(grads_ring[k]),
                                   np.asarray(grads_ag[k]), atol=2e-6,
                                   err_msg=k)
    assert step_ring == 1

def test_ring_render_rows_emits_normals():
    """cfg.render_normals must survive the ring path: the 'normal' map
    assembled from per-tile row strips equals the single-device tiled
    render's (the feat rows were always packed; this guards the
    compositor actually emitting them — advisor finding r2)."""
    from robosimgs_tpu.parallel.ring import ring_render_rows
    from robosimgs_tpu.render.rasterize import rasterize

    assert len(jax.devices()) >= 8
    n_shard, n_tile = 4, 2
    mesh = make_mesh(n_shard, n_tile)
    cfg, cam, g = _setup(n=64)
    cfg = dataclasses.replace(cfg, render_normals=True)
    params = float_params(g)
    offset = jnp.zeros((g.capacity, 2), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    rows = cam.height // n_tile

    def per_device(params, alive, offset):
        tile_rank = jax.lax.axis_index("tile")
        out = ring_render_rows(params, alive, offset, cam, tile_rank,
                               n_tile, cfg, bg, "data", n_shard)
        return out["normal"], out["rgb"]

    pspec = {k: P("data") for k in
             ["means", "quats", "log_scales", "logit_opacities",
              "sh_dc", "sh_rest"]}
    fn = jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(pspec, P("data"), P("data")),
        out_specs=(P("tile"), P("tile")), check_vma=False))
    normal_r, rgb_r = fn(params, g.alive, offset)
    assert normal_r.shape == (cam.height, cam.width, 3)

    ref = rasterize(g, cam, cfg, impl="tiled")
    assert "normal" in ref
    np.testing.assert_allclose(np.asarray(rgb_r), np.asarray(ref["rgb"]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(normal_r),
                               np.asarray(ref["normal"]),
                               atol=1e-4, rtol=1e-3)
