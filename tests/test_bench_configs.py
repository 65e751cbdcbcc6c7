"""Static invariants of the bench/staged RenderConfigs.

The staged bench runs only on the real chip, so a config mistake (a
capacity not divisible by tile_chunk, a packed key overflowing 31 bits,
a spill fraction that can't cover its measured rows) surfaces as a
wasted TPU run — or worse, a silently lossy number. These checks are
pure arithmetic; they pin the r5 lossless-config invariants on CPU.
"""

import math


def _packed_fits(T: int, n: int) -> bool:
    gid_bits = max(1, (n - 1).bit_length())
    return (T + 1) << gid_bits <= 2**31


def test_staged_1m_config_invariants():
    # bench.py::_staged config 3 (scripts/staged_cover_stats.py maxima;
    # K=384 gated 68.5 dB r5 — tile_chunk auto-drops to 0 since 512
    # does not divide 384)
    K, chunk, M, bbox = 384, 512 if 384 % 512 == 0 else 0, 24, 28
    split, frac, n, T = 12, 71680 / 1e6, 1_000_000, 1024
    assert chunk == 0 or K % chunk == 0
    assert bbox >= 25 and M >= 22          # measured scene maxima
    assert 0 < split < M
    assert _packed_fits(T, n + 160)        # survives retry perturbation
    # the spill tier must cover the measured 71680 rows with cover > 12
    # at every retry-perturbed n (rows formula from binning.py)
    for nn in (n, n + 16, n + 160):
        rows = min(nn, max(128, math.ceil(frac * nn / 128) * 128))
        assert rows >= 71680, (nn, rows)


def test_staged_rollout_config_invariants():
    # bench.py::_staged config 4 (scripts/profile_rollout.py maxima:
    # bbox cover 81, survivor cover 61, spill rows 89616 at split=12)
    K, chunk, M, bbox = 512, 512, 64, 84
    split, frac, n = 12, 0.44864, 200_000
    T = (640 // 16) * (480 // 16)
    assert K % chunk == 0
    assert bbox >= 81 and M >= 61
    assert 0 < split < M
    assert _packed_fits(T, n + 160)
    for nn in (n, n + 16, n + 160):
        rows = min(nn, max(128, math.ceil(frac * nn / 128) * 128))
        assert rows >= 89616, (nn, rows)


def test_lossless_gate_reference_capacity():
    # the in-bench staged gate renders at the truly lossless capacity:
    # >= the measured max per-tile demand and chunk-divisible
    assert 22016 >= 21626 and 22016 % 512 == 0
