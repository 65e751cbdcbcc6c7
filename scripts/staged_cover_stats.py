"""Measure the staged 1M@512^2 bench scene's tile-coverage statistics.

Pure measurement (CPU-friendly): projects the exact staged scene from
bench.py::_staged (Gaussians.random key 1, extent 1.5, 512^2 camera) and
reports, for the lossless-config decision (VERDICT round-4 item 1):

  * max bbox tile cover (sizes bbox_tiles_per_gaussian)
  * survivor-cover histogram after the exact ellipse-tile cull
    (sizes max_tiles_per_gaussian for trunc==0, and the two-tier
    split/spill options that stay lossless)
  * true per-tile demand (max_tile_count) at a non-truncating M
  * total true pairs

Run (CPU):  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/staged_cover_stats.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.binning import per_gaussian_cover
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiles import num_tiles, tile_bbox

    n = int(os.environ.get("STAGED_N", 1_000_000))
    res = int(os.environ.get("STAGED_RES", 512))
    cfg = RenderConfig()
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0,
                         res, res)
    g = Gaussians.random(jax.random.PRNGKey(1), n, sh_degree=3, extent=1.5)

    proj = jax.jit(lambda: project(g, cam, cfg))()
    tiles_x, tiles_y = num_tiles(res, res, cfg.tile_size)
    T = tiles_x * tiles_y
    tx0, ty0, tx1, ty1 = tile_bbox(proj.means2d, proj.radii, tiles_x,
                                   tiles_y, cfg.tile_size)
    bbox_cover = np.asarray(jnp.where(
        proj.valid, (tx1 - tx0 + 1).clip(0) * (ty1 - ty0 + 1).clip(0), 0))
    max_bbox = int(bbox_cover.max())
    print(f"n={n} res={res} T={T} valid={int(np.asarray(proj.valid).sum())}")
    print(f"max bbox cover = {max_bbox}")

    # survivor cover after the exact cull, enumerated over the full bbox
    cover = np.asarray(per_gaussian_cover(proj, res, res, cfg,
                                          max_tiles=max_bbox))
    max_surv = int(cover.max())
    total_pairs = int(cover.sum())
    print(f"max survivor cover = {max_surv}; total true pairs = {total_pairs}")

    hist = np.bincount(cover, minlength=max_surv + 1)
    over = n - np.cumsum(hist)          # over[s] = count(cover > s)
    print("cover percentiles:",
          {p: int(np.percentile(cover, p)) for p in (50, 90, 99, 99.9, 100)})
    # two-tier lossless options: spill tier must hold EVERY row with
    # cover > s (rows rounded up to 128); slots = s*n + rows*(M - s)
    rows_of = lambda c: min(n, ((c + 127) // 128) * 128)
    options = []
    for s in range(2, max_surv, 2):
        rows = rows_of(int(over[s]))
        slots = s * n + rows * (max_surv - s)
        options.append((slots, s, rows))
    options.sort()
    print("best lossless two-tier options (slots, split, spill_rows):")
    for slots, s, rows in options[:6]:
        print(f"  split={s:3d} rows={rows:8d} frac={rows/n:.4f} "
              f"slots={slots/1e6:.2f}M (single-tier {max_surv*n/1e6:.1f}M)")

    # true per-tile demand: histogram of tile ids over all surviving
    # pairs — chunked over gaussians to bound memory
    tid_counts = np.zeros(T + 1, np.int64)
    chunk = 100_000
    from robosimgs_tpu.render.binning import _cull_keep, _divmod_small

    @jax.jit
    def chunk_tids(m2d, cop, ctx0, cty0, cbw, ccover, cvalid):
        e = jnp.arange(max_bbox, dtype=jnp.int32)[None, :]
        row, col = _divmod_small(e, jnp.maximum(cbw, 1)[:, None])
        ok = (e < ccover[:, None]) & cvalid[:, None]
        ok = ok & _cull_keep(m2d, cop, ctx0, cty0, col, row,
                             cfg.tile_size, cfg.alpha_min)
        tid = (cty0[:, None] + row) * tiles_x + (ctx0[:, None] + col)
        return jnp.where(ok, tid, T).astype(jnp.int32)

    m2d = np.asarray(proj.means2d)
    cop = np.stack([np.asarray(proj.conics[:, 0]),
                    np.asarray(proj.conics[:, 1]),
                    np.asarray(proj.conics[:, 2]),
                    np.asarray(jnp.where(proj.valid, proj.opacities, 0.0))],
                   axis=1)
    tx0n, ty0n = np.asarray(tx0), np.asarray(ty0)
    bwn = np.asarray((tx1 - tx0 + 1).clip(0))
    validn = np.asarray(proj.valid) & (np.asarray(proj.radii) > 0)
    for i in range(0, n, chunk):
        sl = slice(i, min(i + chunk, n))
        tids = np.asarray(chunk_tids(m2d[sl], cop[sl], tx0n[sl], ty0n[sl],
                                     bwn[sl], bbox_cover[sl], validn[sl]))
        tid_counts += np.bincount(tids.reshape(-1), minlength=T + 1)
    per_tile = tid_counts[:T]
    print(f"per-tile demand: max={int(per_tile.max())} "
          f"mean={per_tile.mean():.0f} "
          f"p99={int(np.percentile(per_tile, 99))} "
          f"sum={int(per_tile.sum())} (== total pairs: "
          f"{int(per_tile.sum()) == total_pairs})")

    out = {
        "n": n, "res": res, "T": T,
        "max_bbox_cover": max_bbox,
        "max_survivor_cover": max_surv,
        "total_true_pairs": total_pairs,
        "max_tile_demand": int(per_tile.max()),
        "two_tier_lossless": [
            {"split": s, "rows": r, "frac": r / n, "slots": sl}
            for sl, s, r in options[:6]],
    }
    path = os.environ.get("STAGED_STATS_OUT",
                          "/tmp/staged_cover_stats.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
