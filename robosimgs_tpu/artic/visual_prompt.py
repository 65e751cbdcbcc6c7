"""Visual prompting ops for mask ranking (the FGVP role).

The reference optionally sharpens CLIP mask-ranking with FGVP's
blur-mask prompt: the candidate region stays sharp while the rest of
the image is heavily Gaussian-blurred (std 100 at 800px,
`interactive_segmenter.py:155-165`, SURVEY.md §2.2). Implemented as a
separable jnp blur so it runs on TPU and composes with any
ImageTextScorer backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.train.losses import _blur


def gaussian_blur(image: jax.Array, std: float) -> jax.Array:
    """Separable Gaussian blur of (H, W, C); window = 4 std (odd)."""
    size = int(4 * std) | 1
    size = min(size, 2 * min(image.shape[:2]) - 1)
    return _blur(image, size, float(std))


def blur_mask_prompt(image: jax.Array, mask: jax.Array,
                     std: float = 100.0, reference_res: int = 800) -> jax.Array:
    """Blur-mask visual prompt: sharp inside the mask, blurred outside.

    std is specified at `reference_res` resolution and scaled to the
    actual image size (the reference used std=100 at 800px renders).
    """
    h = image.shape[0]
    eff_std = max(1.0, std * h / reference_res)
    blurred = gaussian_blur(image, eff_std)
    return jnp.where(mask[..., None], image, blurred)


def crop_prompt(image: np.ndarray, mask: np.ndarray, pad: int = 8,
                background: float = 1.0) -> np.ndarray:
    """Crop-to-mask visual prompt (numpy; the reference's grid-crop
    candidate images for MLLM selection)."""
    ys, xs = np.where(mask)
    if len(ys) == 0:
        return np.asarray(image)
    y0, y1 = max(ys.min() - pad, 0), min(ys.max() + pad + 1, mask.shape[0])
    x0, x1 = max(xs.min() - pad, 0), min(xs.max() + pad + 1, mask.shape[1])
    crop = np.where(mask[y0:y1, x0:x1, None], image[y0:y1, x0:x1], background)
    return crop
