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


def _blur(img: jax.Array, window: jax.Array) -> jax.Array:
    """Separable depthwise blur of (H, W, C), SAME padding."""
    c = img.shape[-1]
    size = window.shape[0]
    x = img[None].transpose(0, 3, 1, 2)  # NCHW
    kh = jnp.broadcast_to(window.reshape(1, 1, size, 1), (c, 1, size, 1))
    kw = jnp.broadcast_to(window.reshape(1, 1, 1, size), (c, 1, 1, size))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad = size // 2
    # full-f32 convs: TPU's default bf16 passes add gradient noise that
    # measurably slows 3DGS convergence
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x.transpose(0, 2, 3, 1)[0]


def ssim(pred: jax.Array, target: jax.Array, window_size: int = 11,
         sigma: float = 1.5, c1: float = 0.01**2, c2: float = 0.03**2) -> jax.Array:
    """Mean SSIM over an (H, W, C) image pair in [0, 1]."""
    w = _gauss_window(window_size, sigma)
    mu_p = _blur(pred, w)
    mu_t = _blur(target, w)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sig_p = _blur(pred * pred, w) - mu_pp
    sig_t = _blur(target * target, w) - mu_tt
    sig_pt = _blur(pred * target, w) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sig_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sig_p + sig_t + c2)
    return jnp.mean(num / den)


def photometric_loss(pred: jax.Array, target: jax.Array,
                     ssim_lambda: float = 0.2) -> jax.Array:
    return (1.0 - ssim_lambda) * l1_loss(pred, target) + ssim_lambda * (1.0 - ssim(pred, target))
