"""Image quality metrics: PSNR, SSIM, L2 cost.

TPU-native equivalents of the used surface of ``ImageQualityIndexes``
(``assess_psnr`` / ``assess_ssim``, reference ``src/BPLDenoising.jl:201-204``)
and ``L2CostFunction`` (``src/BPLDenoising.jl:84-86``).  Implemented in jnp so
they jit/vmap; peak value 1.0 for [0,1] float images, SSIM with the standard
11×11 Gaussian (σ=1.5), K=(0.01, 0.03), computed over the valid (un-padded)
window region as in the original Wang et al. reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "l2_cost"]


def l2_cost(u, utrue):
    """½‖u − ū‖² over the whole stack (ref ``src/BPLDenoising.jl:84-86``)."""
    u = jnp.asarray(u)
    utrue = jnp.asarray(utrue)
    return 0.5 * jnp.sum((u - utrue) ** 2)


def psnr(ref, img, peak: float = 1.0):
    """PSNR in dB of ``img`` against ``ref`` (per image, reduces last 2 axes)."""
    ref = jnp.asarray(ref)
    img = jnp.asarray(img)
    mse = jnp.mean((ref - img) ** 2, axis=(-2, -1))
    return 10.0 * jnp.log10(peak ** 2 / mse)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel(size: int, sigma: float):
    half = (size - 1) / 2.0
    x = np.arange(size) - half
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g))


def _filter2_valid(img, kernel):
    """2-D 'valid' correlation of (..., M, N) with (w, w)."""
    batch = img.shape[:-2]
    x = img.reshape((-1, 1) + img.shape[-2:])
    k = kernel[None, None, :, :].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out.reshape(batch + out.shape[-2:])


def ssim(ref, img, peak: float = 1.0, window_size: int = 11,
         sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """Mean SSIM index (per image, reduces the last two axes)."""
    ref = jnp.asarray(ref)
    img = jnp.asarray(img)
    w = _gaussian_kernel(window_size, sigma).astype(ref.dtype)
    c1 = (k1 * peak) ** 2
    c2 = (k2 * peak) ** 2

    mu1 = _filter2_valid(ref, w)
    mu2 = _filter2_valid(img, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2_valid(ref * ref, w) - mu1_sq
    sigma2_sq = _filter2_valid(img * img, w) - mu2_sq
    sigma12 = _filter2_valid(ref * img, w) - mu12

    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map, axis=(-2, -1))
