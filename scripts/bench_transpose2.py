"""Microbench 2: the gather+swapaxes block's backward as it appears
in-graph, vs a custom_vjp that forces the cotangent contiguous before
the scatter (hypothesis: XLA fuses the (T,16,K)->(T,K,16) cotangent
transpose into the scatter and de-vectorizes the row updates).

Run: bash scripts/tpu_run.sh scripts/bench_transpose2.py
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


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    N, T, K, C = 100_000, 256, 512, 16
    R = T * K
    rng = np.random.default_rng(0)
    sel = jnp.asarray(rng.integers(0, N, (T, K), dtype=np.int32))
    packed = jnp.asarray(rng.standard_normal((N, C), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((T, C, K), dtype=np.float32))

    def timeit(f, *args, iters=50):
        r = f(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(iters):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.time() - t0) / iters * 1000.0

    # A: autodiff through gather + swapaxes (the in-graph pattern)
    def fA(p):
        g = jnp.swapaxes(p[sel], 1, 2)          # (T, C, K)
        return jnp.sum(g * w)

    # B: custom_vjp — contiguous rows + barrier before one scatter
    @jax.custom_vjp
    def gatherB(p):
        return jnp.swapaxes(p[sel], 1, 2)

    def gB_fwd(p):
        return gatherB(p), None

    def gB_bwd(_, ct):
        ct = jnp.swapaxes(ct, 1, 2).reshape(R, C)
        ct = jax.lax.optimization_barrier(ct)
        d = jnp.zeros((N, C), ct.dtype).at[sel.reshape(R)].add(ct)
        return (d,)

    gatherB.defvjp(gB_fwd, gB_bwd)

    def fB(p):
        return jnp.sum(gatherB(p) * w)

    # C: like B but scatter in K-major order (no transpose at all:
    # scatter the (T,K,C)-layout cotangent rows directly)
    @jax.custom_vjp
    def gatherC(p):
        return jnp.swapaxes(p[sel], 1, 2)

    def gC_fwd(p):
        return gatherC(p), None

    def gC_bwd(_, ct):
        # ct is (T, C, K): move K inward WITHOUT materializing?
        # transpose is needed; compare cost of explicit transpose+copy
        ct2 = jnp.transpose(ct, (0, 2, 1))      # (T, K, C)
        ct2 = ct2.reshape(R, C)
        d = jnp.zeros((N, C), ct.dtype).at[sel.reshape(R)].add(ct2)
        return (d,)

    gatherC.defvjp(gC_fwd, gC_bwd)

    def fC(p):
        return jnp.sum(gatherC(p) * w)

    gA = jax.jit(jax.grad(fA))
    gB = jax.jit(jax.grad(fB))
    gC = jax.jit(jax.grad(fC))
    ra, rb, rc = np.asarray(gA(packed)), np.asarray(gB(packed)), \
        np.asarray(gC(packed))
    print("B relerr", np.abs(rb - ra).max() / np.abs(ra).max(),
          " C relerr", np.abs(rc - ra).max() / np.abs(ra).max())
    print(f"  A autodiff (fused transpose+scatter): {timeit(gA, packed):7.2f} ms")
    print(f"  B barrier + contiguous scatter:       {timeit(gB, packed):7.2f} ms")
    print(f"  C explicit transpose, no barrier:     {timeit(gC, packed):7.2f} ms")
    # D: scatter-only floor (contiguous rows, no transpose in timing)
    ctf = jnp.asarray(rng.standard_normal((R, C), dtype=np.float32))
    self_ = sel.reshape(R)
    def fD(ct):
        return jnp.zeros((N, C), ct.dtype).at[self_].add(ct)
    print(f"  D scatter-only floor:                 {timeit(jax.jit(fD), ctf):7.2f} ms")
    _done["ok"] = True


if __name__ == "__main__":
    main()
