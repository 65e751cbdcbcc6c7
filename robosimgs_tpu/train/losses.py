"""Training losses: L1 + SSIM (the 3DGS photometric loss) and PSNR.

The reference pipeline trains its background scene with Nerfstudio
splatfacto, whose loss is (1-lambda)*L1 + lambda*(1-SSIM), lambda=0.2
(SURVEY.md §3.4). SSIM uses the standard 11-tap Gaussian window
(sigma 1.5), implemented as two separable depthwise 1D convolutions —
XLA fuses these into efficient TPU convs; no im2col materialization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def psnr(pred: jax.Array, target: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=8)
def _gauss_window_np(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - size // 2
    w = np.exp(-(x**2) / (2 * sigma**2))
    return (w / w.sum()).astype(np.float32)


def _gauss_window(size: int, sigma: float):
    # jnp conversion happens at trace time (a cached jnp array would leak
    # a tracer out of whatever transformation first built it)
    return jnp.asarray(_gauss_window_np(size, sigma))


@functools.lru_cache(maxsize=16)
def _band_matrix_np(length: int, size: int, sigma: float) -> np.ndarray:
    """(length, length) banded blur matrix == separable 1D conv with
    SAME zero padding (out-of-range taps contribute 0)."""
    w = _gauss_window_np(size, sigma)
    m = np.zeros((length, length), np.float32)
    half = size // 2
    for k in range(size):
        off = k - half
        d = np.full(length - abs(off), w[k], np.float32)
        m += np.diag(d, off)
    return m


def _blur(img: jax.Array, size: int, sigma: float) -> jax.Array:
    """Separable blur of (H, W, C), SAME padding, as two BAND-MATRIX
    matmuls — the 11-tap depthwise convs this replaces lowered to slow
    VPU passes on TPU; a (H, H) @ (H, W*C) banded matmul does the same
    contraction on the MXU (the band matrix is >95% zeros, but the MXU
    doesn't care and the total is ~100 MFLOP at 256^2). Full-f32: TPU's
    default bf16 passes add gradient noise that measurably slows 3DGS
    convergence."""
    H, W, C = img.shape
    bh = jnp.asarray(_band_matrix_np(H, size, sigma))
    bw = jnp.asarray(_band_matrix_np(W, size, sigma))
    hp = jax.lax.Precision.HIGHEST
    x = jnp.matmul(bh, img.reshape(H, W * C), precision=hp).reshape(H, W, C)
    x = jax.lax.dot_general(x, bw, (((1,), (1,)), ((), ())),
                            precision=hp)               # (H, C, W)
    return jnp.transpose(x, (0, 2, 1))


def ssim(pred: jax.Array, target: jax.Array, window_size: int = 11,
         sigma: float = 1.5, c1: float = 0.01**2, c2: float = 0.03**2) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair in [0, 1]."""
    mu_p = _blur(pred, window_size, sigma)
    mu_t = _blur(target, window_size, sigma)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sig_p = _blur(pred * pred, window_size, sigma) - mu_pp
    sig_t = _blur(target * target, window_size, sigma) - mu_tt
    sig_pt = _blur(pred * target, window_size, sigma) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sig_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sig_p + sig_t + c2)
    return jnp.mean(num / den)


def photometric_loss(pred: jax.Array, target: jax.Array,
                     ssim_lambda: float = 0.2) -> jax.Array:
    return (1.0 - ssim_lambda) * l1_loss(pred, target) + ssim_lambda * (1.0 - ssim(pred, target))


def normals_from_depth(depth: jax.Array, fx, fy, cx, cy):
    """Camera-space surface normals from a depth map by central
    differences of the unprojected point map (the geometric target of
    the 2DGS-style normal-consistency regularizer).

    depth: (H, W) camera-space z (alpha-normalized expected splat
    depth). Returns (normals (H, W, 3) unit, oriented toward the
    camera; valid (H, W) bool — border pixels, where the central
    difference wraps, are invalid).

    Pixel centers sit at integer coords with u = fx*x/z + cx - 0.5
    (core/camera.py), so unprojection uses (u + 0.5 - cx) / fx.
    """
    h, w = depth.shape
    u = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    v = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    p = jnp.stack([depth * (u - cx) / fx, depth * (v - cy) / fy, depth], -1)
    du = jnp.roll(p, -1, axis=1) - jnp.roll(p, 1, axis=1)
    dv = jnp.roll(p, -1, axis=0) - jnp.roll(p, 1, axis=0)
    n = jnp.cross(dv, du)
    # rsqrt of a clamped square, NOT n / max(norm, eps): the norm's own
    # gradient at 0 is NaN and poisons gated-out pixels (where-grad trap)
    sq = jnp.sum(n * n, -1, keepdims=True)
    n = n * jax.lax.rsqrt(jnp.maximum(sq, 1e-20))
    flip = jnp.where(jnp.sum(n * p, -1) > 0.0, -1.0, 1.0)
    n = n * flip[..., None]
    valid = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    return n, valid
