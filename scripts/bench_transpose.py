"""Microbench: variants of the gather-transpose (the backward of
`packed[sel]`) at the bench config. The XLA scatter-add this lowers to
by default serializes row updates (~28 ns/row measured); candidates
reorder the cotangent rows by destination id first so the reduction
becomes a sorted segmented sum.

Run: bash scripts/tpu_run.sh scripts/bench_transpose.py [N] [T] [K] [C]
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


def timeit(f, *args, iters=50):
    import jax
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / iters * 1000.0


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    C = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    R = T * K
    print(f"N={N} T={T} K={K} C={C} rows={R}")

    rng = np.random.default_rng(0)
    # realistic duplicate structure: each gaussian appears in ~R/N tiles
    sel = jnp.asarray(rng.integers(0, N, (R,), dtype=np.int32))
    ct = jnp.asarray(rng.standard_normal((R, C), dtype=np.float32))

    def v_scatter(sel, ct):
        return jnp.zeros((N, C), jnp.float32).at[sel].add(ct)

    def v_scatter_sorted_hint(sel, ct):
        o = jnp.argsort(sel)
        return jnp.zeros((N, C), jnp.float32).at[sel[o]].add(
            ct[o], indices_are_sorted=True)

    def v_segsum_sorted(sel, ct):
        o = jnp.argsort(sel)
        return jax.ops.segment_sum(ct[o], sel[o], num_segments=N,
                                   indices_are_sorted=True)

    def v_cumsum(sel, ct):
        o = jnp.argsort(sel)
        cs = jnp.cumsum(ct[o], axis=0)                      # (R, C)
        cs = jnp.concatenate([jnp.zeros((1, C), jnp.float32), cs])
        b = jnp.searchsorted(sel[o], jnp.arange(N + 1, dtype=jnp.int32))
        return cs[b[1:]] - cs[b[:-1]]

    ref = np.asarray(v_scatter(sel, ct))
    for name, f in [("scatter", v_scatter),
                    ("scatter+sorted-hint", v_scatter_sorted_hint),
                    ("segsum-sorted", v_segsum_sorted),
                    ("cumsum-diff", v_cumsum)]:
        jf = jax.jit(f)
        out = np.asarray(jf(sel, ct))
        err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
        t = timeit(jf, sel, ct)
        print(f"  {name:22s} {t:7.2f} ms   relerr {err:.2e}")
    _done["ok"] = True


if __name__ == "__main__":
    main()
