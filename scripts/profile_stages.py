"""Per-stage latency profile of the training step on real TPU.

Feeds docs/ROOFLINE.md: times each pipeline stage standalone (jitted,
loop of 30 with one trailing block_until_ready — per CLAUDE.md the
per-call dispatch latency makes single-call timings meaningless) at the
bench config (100k Gaussians, 256x256, M=16, K=1024), plus the fused
fwd-only render and full train step for the overlap picture.

Run: bash scripts/tpu_run.sh scripts/profile_stages.py [n] [res]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_done = {"ok": False}


def _watchdog():
    time.sleep(420)
    if not _done["ok"]:
        print("WATCHDOG: compile wedged — rerun this script", flush=True)
        os._exit(17)


def timeit(f, *args, iters=30):
    r = f(*args)
    jax_block(r)
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    jax_block(r)
    return (time.time() - t0) / iters * 1000.0


def jax_block(r):
    import jax
    jax.block_until_ready(r)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"probe {time.time()-t0:.1f}s backend={jax.default_backend()}")

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render import binning
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.pallas_kernels import (
        composite_bwd_pallas, composite_fwd_pallas)
    from robosimgs_tpu.render.project import project
    from robosimgs_tpu.render.tiled import composite_tiled
    from robosimgs_tpu.render.tiles import num_tiles, tile_bbox
    from robosimgs_tpu.train.losses import photometric_loss
    from robosimgs_tpu.train.optim import float_params, make_optimizer

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    # default = the BENCH config (M=10 survivor compaction over a
    # 12-tile bbox, K=512) so the table decomposes the number the
    # driver actually records; RSGS_PROF_M/_K/_BBOX override
    cfg = RenderConfig(
        tile_capacity=int(os.environ.get("RSGS_PROF_K", 512)),
        max_tiles_per_gaussian=int(os.environ.get("RSGS_PROF_M", 10)),
        bbox_tiles_per_gaussian=int(os.environ.get("RSGS_PROF_BBOX", 12)),
        two_tier_split=int(os.environ.get("RSGS_PROF_TT", 4)),
        two_tier_spill_frac=float(os.environ.get("RSGS_PROF_TT_FRAC",
                                                 0.15)))
    M, K = cfg.max_tiles_per_gaussian, cfg.tile_capacity
    cam = Camera.look_at([4.0, 0.5, 1.2], [0, 0, 0], [0, 0, 1], 60.0, res, res)
    g = Gaussians.random(jax.random.PRNGKey(0), n, sh_degree=3, extent=1.5)
    tiles_x, tiles_y = num_tiles(res, res, cfg.tile_size)
    T = tiles_x * tiles_y
    P = cfg.tile_size ** 2

    proj = jax.jit(lambda g: project(g, cam, cfg))(g)
    jax_block(proj)
    _done["ok"] = True
    t_project = timeit(jax.jit(lambda g: project(g, cam, cfg)), g)

    # -- binning sub-stages (standalone; the fused graph overlaps them) --
    depths, valid = proj.depths, proj.valid
    order = jax.jit(lambda d, v: jnp.argsort(jnp.where(v, d, jnp.inf))
                    .astype(jnp.int32))(depths, valid)
    t_argsort = timeit(
        jax.jit(lambda d, v: jnp.argsort(jnp.where(v, d, jnp.inf))), depths, valid)

    def wide_permute(proj, order):
        zeros = jnp.zeros_like(proj.depths)
        packed = jnp.stack([proj.means2d[:, 0]] * 19, axis=1) + zeros[:, None]
        return packed[order]
    _ = jax.jit(wide_permute)(proj, order)
    t_permute = timeit(jax.jit(wide_permute), proj, order)
    valid_s, radii_s, m2d_s = (proj.valid[order], proj.radii[order],
                               jax.lax.stop_gradient(proj.means2d)[order])

    def tid_expand(m2d_s, radii_s, valid_s):
        tx0, ty0, tx1, ty1 = tile_bbox(m2d_s, radii_s, tiles_x, tiles_y,
                                       cfg.tile_size)
        bw = (tx1 - tx0 + 1).clip(0)
        cover = bw * (ty1 - ty0 + 1).clip(0)
        e = jnp.arange(M, dtype=jnp.int32)[None, :]
        row, col = binning._divmod_small(e, jnp.maximum(bw, 1)[:, None])
        valid_e = (e < cover[:, None]) & valid_s[:, None]
        tid = (ty0[:, None] + row) * tiles_x + (tx0[:, None] + col)
        return jnp.where(valid_e, tid, T).astype(jnp.int32)
    tid = jax.jit(tid_expand)(m2d_s, radii_s, valid_s)
    t_tid = timeit(jax.jit(tid_expand), m2d_s, radii_s, valid_s)

    gid_bits = max(1, (n - 1).bit_length())
    gid = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, M))

    def keypack(tid):
        return (tid.reshape(-1) << gid_bits) | gid.reshape(-1)
    pk = jax.jit(keypack)(tid)
    t_keypack = timeit(jax.jit(keypack), tid)

    s_key = jax.jit(jax.lax.sort)(pk)
    t_sort = timeit(jax.jit(jax.lax.sort), pk)

    queries = jnp.arange(T + 1, dtype=jnp.int32) << gid_bits

    def bounds_fn(s_key):
        return jnp.searchsorted(s_key, queries)
    bounds = jax.jit(bounds_fn)(s_key)
    t_search = timeit(jax.jit(bounds_fn), s_key)

    def selgather(s_key, bounds):
        s_key_pad = jnp.concatenate(
            [s_key, jnp.full((K,), jnp.int32(2**31 - 1))])
        win = jax.vmap(lambda s: jax.lax.dynamic_slice(s_key_pad, (s,), (K,)))(
            jnp.minimum(bounds[:-1], n * M))
        sel_rank = win & ((1 << gid_bits) - 1)
        counts = jnp.minimum(bounds[1:] - bounds[:-1], K)
        kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
        return jnp.where(kmask, sel_rank, 0), kmask
    sel, kmask = jax.jit(selgather)(s_key, bounds)
    t_selg = timeit(jax.jit(selgather), s_key, bounds)

    def featgather(proj, sel, kmask):
        zeros = jnp.zeros_like(proj.depths)
        ones = jnp.ones_like(proj.depths)
        mask_f = proj.valid.astype(jnp.float32)
        packed = jnp.stack([
            proj.means2d[:, 0], proj.means2d[:, 1],
            proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2],
            proj.opacities * mask_f,
            jax.lax.stop_gradient(proj.depths), zeros,
            proj.colors[:, 0], proj.colors[:, 1], proj.colors[:, 2],
            proj.depths, ones, zeros, zeros, zeros], axis=1)
        gathered = packed[sel]
        gathered = gathered.at[:, :, 5].set(
            jnp.where(kmask, gathered[:, :, 5], 0.0))
        return jnp.swapaxes(gathered, 1, 2)
    gathered = jax.jit(featgather)(proj, sel, kmask)
    t_featg = timeit(jax.jit(featgather), proj, sel, kmask)

    # transpose of (permute + full-row gather): the backward scatter path
    def gather_bwd(proj, sel, kmask, ct):
        def f(means2d, colors, opacities, depths):
            packed = jnp.stack([
                means2d[:, 0], means2d[:, 1], colors[:, 0], colors[:, 1],
                colors[:, 2], opacities, depths, depths,
                means2d[:, 0], means2d[:, 1], colors[:, 0], colors[:, 1],
                colors[:, 2], opacities, depths, depths], axis=1)
            g = packed[order][sel]
            return jnp.sum(g * ct)
        return jax.grad(f, argnums=(0, 1, 2, 3))(
            jax.lax.stop_gradient(proj.means2d), proj.colors,
            proj.opacities, proj.depths)
    ct = jnp.ones((T, K, 16), jnp.float32)
    _ = jax.jit(gather_bwd)(proj, sel, kmask, ct)
    t_gbwd = timeit(jax.jit(gather_bwd), proj, sel, kmask, ct)

    # loss fwd+bwd alone (L1 + SSIM at res^2)
    from robosimgs_tpu.train.losses import photometric_loss as _pl
    img = jnp.zeros((res, res, 3)) + 0.3
    tgt2 = jnp.zeros((res, res, 3))
    t_loss = timeit(jax.jit(jax.grad(lambda a: _pl(a, tgt2))), img)

    # adam update alone
    opt2 = make_optimizer()
    par2 = float_params(g)
    os2 = opt2.init(par2)
    def adam_step(par, os_):
        import optax
        up, os_ = opt2.update(par, os_, par)
        return optax.apply_updates(par, up), os_
    t_adam = timeit(jax.jit(adam_step), par2, os2)

    # -- full binning + kernels --
    bg = jax.jit(functools_partial(binning.bin_and_gather_packed,
                                   width=res, height=res, cfg=cfg))
    geom, feat, counts, stats = bg(proj)
    jax_block(geom)
    t_bin_full = timeit(bg, proj)

    dlim = jnp.full((T, P, 1), jnp.inf, jnp.float32)
    fwd = jax.jit(lambda ge, fe, c, d: composite_fwd_pallas(
        ge, fe, c, d, tiles_x=tiles_x, cfg=cfg))
    out, tfin, nblk = fwd(geom, feat, counts, dlim)
    jax_block(out)
    t_fwd_k = timeit(fwd, geom, feat, counts, dlim)

    gout = jnp.ones_like(out)
    bwd = jax.jit(lambda ge, fe, c, d, go, tf, nb: composite_bwd_pallas(
        ge, fe, c, d, go, tf, nb, tiles_x=tiles_x, cfg=cfg))
    dg = bwd(geom, feat, counts, dlim, gout, tfin, nblk.reshape(-1))
    jax_block(dg)
    t_bwd_k = timeit(bwd, geom, feat, counts, dlim, gout, tfin,
                     nblk.reshape(-1))

    # -- fused end-to-end --
    target = jnp.zeros((res, res, 3))
    optimizer = make_optimizer()
    params = float_params(g)
    opt_state = optimizer.init(params)

    fwd_render = jax.jit(lambda p: composite_tiled(
        project(g.replace(**p), cam, cfg), res, res, cfg)["rgb"])
    t_render = timeit(fwd_render, params)

    def step(params, opt_state):
        def loss_fn(p):
            out = composite_tiled(project(g.replace(**p), cam, cfg),
                                  res, res, cfg)
            return photometric_loss(out["rgb"], target)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        import optax
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss
    stepj = jax.jit(step)
    t_step = timeit(stepj, params, opt_state)

    def vgrad(params):
        def loss_fn(p):
            out = composite_tiled(project(g.replace(**p), cam, cfg),
                                  res, res, cfg)
            return photometric_loss(out["rgb"], target)
        return jax.value_and_grad(loss_fn)(params)
    t_grad = timeit(jax.jit(vgrad), params)

    print(f"\n== stage profile @ {n}/{res}^2, M={M}, K={K}, T={T} ==")
    for name, t in [
        ("project", t_project), ("argsort", t_argsort),
        ("narrow-permute", t_permute), ("tid-expand", t_tid),
        ("key-pack", t_keypack), (f"sort({n*M//1000}k)", t_sort),
        ("searchsorted", t_search), ("sel-window", t_selg),
        ("feat-gather", t_featg), ("gather-transpose(bwd)", t_gbwd),
        ("bin_and_gather(fused)", t_bin_full),
        ("pallas-fwd", t_fwd_k), ("pallas-bwd", t_bwd_k),
        ("loss-bwd", t_loss), ("adam", t_adam),
        ("fwd render e2e", t_render), ("value_and_grad e2e", t_grad),
        ("train step e2e", t_step),
    ]:
        print(f"  {name:24s} {t:7.2f} ms")


def functools_partial(f, **kw):
    import functools
    import jax
    return jax.jit(functools.partial(f, **kw))


if __name__ == "__main__":
    main()
