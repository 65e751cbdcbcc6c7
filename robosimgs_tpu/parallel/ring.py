"""Ring-streamed gaussian-sharded tile gathering (`lax.ppermute`).

The beyond-HBM memory-scaling path (SURVEY.md §2.3 SP/CP row, §5
long-context analog; BASELINE config 5): the Gaussian set lives sharded
over the 'data' mesh axis and is NEVER materialized whole on any
device. Instead each device's shard of *raw parameters* rotates around
the 'data' ring; at every hop each tile rank projects the visiting
chunk with its row-strip crop camera, tile-bins it with the standard
packed-sort binner, and MERGES the chunk's per-tile candidates into a
carried (T, K) top-K buffer ordered by (depth, global id).

Top-K selection by a total order is associative (any entry in the
global per-tile top-K is in its chunk's top-K), and (depth, global id)
is exactly the stable depth-argsort order of the all_gather path — so
the final (geom, feat, counts) match the all-gathered computation,
while per-device memory stays O(N/n_shard + T*K).

Differentiation: a plain autodiff trace of the merge would make jax
save every visiting chunk (O(N) residuals), so the ring is a custom_vjp
whose backward REPLAYS the rotation (reversible-loop
rematerialization): the merged (T, K) global-id matrix recorded in the
forward tells which output slots each chunk owns; the backward rotates
(chunk, grad-accumulator) pairs one full revolution, at each hop
pulling the masked output cotangent through that chunk's
project->pack16->row-gather VJP. After n hops the accumulated
gradients arrive home at their owning shard.

Truncation accounting: per-chunk binning stats are summed across hops
and merge-level drops (sum of per-chunk counts exceeding K) are folded
into `overflowed_tiles` / `max_tile_count`. A tile that overflows both
inside a chunk and at the merge can be counted twice — the counters
are an upper bound, but they are zero exactly when nothing anywhere
was dropped (the invariant the zero-truncation tests assert).

Role in the reference stack: this replaces the multi-GPU scaling the
reference delegates to torch.distributed/NCCL (SURVEY.md §2.2, §2.3),
re-designed for TPU ICI collectives (structurally ring attention with
stationary tiles as queries and rotating Gaussian chunks as KV).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.binning import BinStats, bin_and_gather_packed, pack16
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import project
from robosimgs_tpu.render.tiled import composite_from_tiles

_BIG_GID = jnp.int32(2**30)


def _float0_like(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _chunk_tiles(params: Dict[str, jax.Array], alive: jax.Array,
                 offset: jax.Array, gid0: jax.Array, cam,
                 width: int, rows: int, cfg: RenderConfig):
    """Project + bin one visiting chunk for this rank's row strip.

    Returns (payload (T,16,K), keys (T,K) depth, gids (T,K) global id,
    counts (T,), stats, (radii, valid) densify side-channel)."""
    crop, thf = cam
    p = Gaussians(**params, alive=alive)
    proj = project(p, crop, cfg, means2d_offset=offset, tan_half_fov=thf)
    geom, feat, counts, stats, sel = bin_and_gather_packed(
        proj, width, rows, cfg, return_sel=True)
    K = cfg.tile_capacity
    kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    keys = jnp.where(kmask, geom[:, 6, :], jnp.inf)          # sg(depth) row
    gids = jnp.where(kmask, gid0 + sel, _BIG_GID)
    payload = jnp.concatenate([geom, feat], axis=1)          # (T, 16, K)
    return payload, keys, gids, counts, stats, (proj.radii, proj.valid)


def _merge_topk(keys_a, gids_a, pay_a, keys_b, gids_b, pay_b, K: int):
    """Merge two per-tile candidate sets, keeping the first K entries by
    (depth, global id) — the stable depth-argsort total order. (depth,
    gid) pairs of valid entries are unique (a gaussian contributes at
    most one entry per tile and lives in exactly one chunk), so sort
    instability can only permute inert padding."""
    keys2 = jnp.concatenate([keys_a, keys_b], axis=1)        # (T, 2K)
    gids2 = jnp.concatenate([gids_a, gids_b], axis=1)
    idx2 = jnp.broadcast_to(
        jnp.arange(keys2.shape[1], dtype=jnp.int32)[None, :], keys2.shape)
    sk, sg_, si = jax.lax.sort((keys2, gids2, idx2), dimension=1, num_keys=2)
    pay2 = jnp.concatenate([pay_a, pay_b], axis=2)           # (T, 16, 2K)
    pay = jnp.take_along_axis(pay2, si[:, None, :K], axis=2)
    return sk[:, :K], sg_[:, :K], pay


def _rotate(tree, axis_name: str, n: int):
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.tree_util.tree_map(
        lambda x: jax.lax.ppermute(x, axis_name, perm), tree)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def ring_bin_gather(params: Dict[str, jax.Array], alive: jax.Array,
                    offset: jax.Array, cam,
                    width: int, rows: int, cfg: RenderConfig,
                    axis_name: str, n_shard: int):
    """Ring-streamed bin+gather over the `axis_name` mesh ring.

    params/alive/offset are this device's LOCAL shard (float param dict
    as produced by `float_params`, (nc,) bool, (nc, 2)); cam is
    (crop Camera, full-frame tan_half_fov) for THIS tile rank — traced
    leaves, passed as a differentiable arg with zero cotangents.
    Returns (geom (T,8,K), feat (T,8,K), counts (T,), stats, radii,
    valid) where (geom, feat, counts, stats) are identical to
    `bin_and_gather_packed` run on the all-gathered projection, and
    (radii (nc,), valid (nc,)) are the LOCAL shard's projected radii /
    frustum-validity from its hop-0 visit — the densify-statistics
    side channel (non-differentiable: the backward drops their
    cotangents), saving callers an extra O(N/shard) projection.
    """
    out, _ = _ring_fwd_impl(params, alive, offset, cam, width, rows, cfg,
                            axis_name, n_shard)
    return out


def _ring_fwd_impl(params, alive, offset, cam, width, rows, cfg,
                   axis_name, n_shard):
    K = cfg.tile_capacity
    nc = alive.shape[0]
    shard = jax.lax.axis_index(axis_name)

    def visit(chunk, hop):
        cparams, calive, coff = chunk
        gid0 = ((shard - hop) % n_shard) * nc
        return _chunk_tiles(cparams, calive, coff, gid0, cam, width, rows,
                            cfg)

    chunk = (params, alive, offset)
    pay, keys, gids, counts0, st0, (radii0, valid0) = visit(chunk, 0)
    csum = counts0
    acc = (st0.truncated_gaussians, st0.overflowed_tiles,
           st0.max_tile_count, st0.total_pairs)

    def body(h, carry):
        chunk, keys, gids, pay, csum, acc = carry
        chunk = _rotate(chunk, axis_name, n_shard)
        pay_c, keys_c, gids_c, counts_c, st_c, _rv = visit(chunk, h)
        keys, gids, pay = _merge_topk(keys, gids, pay,
                                      keys_c, gids_c, pay_c, K)
        csum = csum + counts_c
        acc = (acc[0] + st_c.truncated_gaussians,
               acc[1] + st_c.overflowed_tiles,
               jnp.maximum(acc[2], st_c.max_tile_count),
               acc[3] + st_c.total_pairs)
        return chunk, keys, gids, pay, csum, acc

    chunk, keys, gids, pay, csum, acc = jax.lax.fori_loop(
        1, n_shard, body, (chunk, keys, gids, pay, csum, acc))

    counts = jnp.minimum(csum, K)
    stats = BinStats(
        truncated_gaussians=acc[0],
        overflowed_tiles=acc[1] + jnp.sum(csum > K).astype(jnp.int32),
        max_tile_count=jnp.maximum(acc[2], jnp.max(csum)),
        total_pairs=acc[3])
    geom = pay[:, :8]
    feat = pay[:, 8:]
    return (geom, feat, counts, stats, radii0, valid0), gids


def _ring_fwd(params, alive, offset, cam, width, rows, cfg, axis_name,
              n_shard):
    out, gids = _ring_fwd_impl(params, alive, offset, cam, width, rows, cfg,
                               axis_name, n_shard)
    res = (params, alive, offset, cam, gids, out[2])
    return out, res


def _ring_bwd(width, rows, cfg, axis_name, n_shard, res, cts):
    params, alive, offset, cam, gids, counts = res
    d_geom, d_feat, _d_counts, _d_stats, _d_radii, _d_valid = cts
    K = cfg.tile_capacity
    nc = alive.shape[0]
    shard = jax.lax.axis_index(axis_name)
    crop, thf = cam
    d_pay = jnp.concatenate([d_geom, d_feat], axis=1)        # (T, 16, K)
    kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
    ct = jnp.where(kmask[:, None, :], d_pay, 0.0)
    ct = jnp.swapaxes(ct, 1, 2)                              # (T, K, 16)

    def chunk_grad(chunk, hop):
        """VJP of (project -> pack16 -> row gather at this chunk's output
        slots) — the top-K merge is pure routing, captured by `mine`."""
        cparams, calive, coff = chunk
        gid0 = ((shard - hop) % n_shard) * nc
        mine = (gids >= gid0) & (gids < gid0 + nc)
        local = jnp.where(mine, gids - gid0, 0)

        def h(cp_, coff_):
            p = Gaussians(**cp_, alive=calive)
            proj = project(p, crop, cfg, means2d_offset=coff_,
                           tan_half_fov=thf)
            gath = pack16(proj)[local]                       # (T, K, 16)
            return jnp.sum(jnp.where(mine[..., None], gath, 0.0) * ct)

        return jax.grad(h, argnums=(0, 1))(cparams, coff)

    chunk = (params, alive, offset)
    gacc = chunk_grad(chunk, 0)

    def body(h, carry):
        chunk, gacc = carry
        chunk = _rotate(chunk, axis_name, n_shard)
        gacc = _rotate(gacc, axis_name, n_shard)
        gc = chunk_grad(chunk, h)
        gacc = jax.tree_util.tree_map(jnp.add, gacc, gc)
        return chunk, gacc

    chunk, gacc = jax.lax.fori_loop(1, n_shard, body, (chunk, gacc))
    # one final hop completes the revolution: gradients arrive home
    gacc = _rotate(gacc, axis_name, n_shard)
    d_params, d_offset = gacc
    d_cam = jax.tree_util.tree_map(jnp.zeros_like, cam)
    return d_params, _float0_like(alive), d_offset, d_cam


ring_bin_gather.defvjp(_ring_fwd, _ring_bwd)


def ring_render_rows(params: Dict[str, jax.Array], alive: jax.Array,
                     offset: jax.Array, camera: Camera, tile_rank,
                     n_tile: int, cfg: RenderConfig, background: jax.Array,
                     axis_name: str, n_shard: int,
                     compositor: str = "pallas") -> Dict[str, jax.Array]:
    """Render this tile rank's row strip against the full ring-streamed
    Gaussian set. Convenience wrapper: crop camera + ring_bin_gather +
    composite_from_tiles. Besides the image outputs, the dict carries
    the local shard's hop-0 "radii"/"valid" (densify side channel,
    non-differentiable — see ring_bin_gather)."""
    import dataclasses

    rows = camera.height // n_tile
    crop = dataclasses.replace(camera, cy=camera.cy - tile_rank * rows,
                               height=rows)
    geom, feat, counts, stats, radii, valid = ring_bin_gather(
        params, alive, offset, (crop, camera.tan_half_fov),
        camera.width, rows, cfg, axis_name, n_shard)
    # the ring's project() never carries an absgrad probe, so when
    # cfg.render_normals is on the packed feat rows 5/6/7 hold full xyz
    # splat normals — emit the "normal" output instead of dropping it
    out = composite_from_tiles(geom, feat, counts, camera.width, rows, cfg,
                               background, compositor=compositor,
                               normal_mode=("xyz" if cfg.render_normals
                                            else "none"))
    out["stats"] = stats
    out["radii"] = jax.lax.stop_gradient(radii)
    out["valid"] = jax.lax.stop_gradient(valid)
    return out
