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

__all__ = ["psnr", "ssim", "l2_cost", "ssim_np", "psnr_np"]


def psnr_np(ref, img, peak: float = 1.0) -> float:
    """Host-side float64 PSNR for report tables (immune to the device
    backend's precision — jnp without x64 silently computes in float32)."""
    ref = np.asarray(ref, dtype=np.float64)
    img = np.asarray(img, dtype=np.float64)
    mse = np.mean((ref - img) ** 2)
    return float(10.0 * np.log10(peak ** 2 / mse))


def ssim_np(ref, img, peak: float = 1.0, window_size: int = 11,
            sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03) -> float:
    """Host-side float64 SSIM (scipy valid-window correlation); matches the
    jnp implementation to ~1e-12 in float64."""
    from scipy.signal import correlate2d
    ref = np.asarray(ref, dtype=np.float64)
    img = np.asarray(img, dtype=np.float64)
    w = np.asarray(_gaussian_kernel(window_size, sigma), dtype=np.float64)
    c1 = (k1 * peak) ** 2
    c2 = (k2 * peak) ** 2
    filt = lambda a: correlate2d(a, w, mode="valid")
    mu1, mu2 = filt(ref), filt(img)
    s1 = np.maximum(filt(ref * ref) - mu1 ** 2, 0.0)
    s2 = np.maximum(filt(img * img) - mu2 ** 2, 0.0)
    s12 = filt(ref * img) - mu1 * mu2
    bound = np.sqrt(s1 * s2)
    s12 = np.clip(s12, -bound, bound)
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return float(m.mean())


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

    # E[x²]−μ² cancels catastrophically in float32 on near-flat windows,
    # producing negative variances and SSIM > 1; clamp to the feasible set
    # (σ² ≥ 0, |σ₁₂| ≤ σ₁σ₂) so the index stays in [−1, 1].
    sigma1_sq = jnp.maximum(sigma1_sq, 0.0)
    sigma2_sq = jnp.maximum(sigma2_sq, 0.0)
    bound = jnp.sqrt(sigma1_sq * sigma2_sq)
    sigma12 = jnp.clip(sigma12, -bound, bound)

    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map, axis=(-2, -1))
