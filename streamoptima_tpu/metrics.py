"""Quality metrics: PSNR and SSIM (skimage-compatible, no skimage dependency).

Twin of calculate_metrics (Encoder.py:934-935): PSNR with data_range=255 and
SSIM with win_size=11 (uniform filter, K1=0.01, K2=0.03, uint8 data_range
255, covariance normalization N/(N-1)) - matching
skimage.metrics.structural_similarity defaults for uint8 2D inputs.
"""
from __future__ import annotations

import numpy as np


def psnr(a, b, data_range: float = 255.0) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    err = np.mean((a - b) ** 2)
    if err == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range ** 2) / err))


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    """scipy.ndimage.uniform_filter twin ('reflect' boundary mode)."""
    from scipy.ndimage import uniform_filter

    return uniform_filter(x, size=size)


def ssim(a, b, win_size: int = 11, data_range: float = 255.0) -> float:
    im1 = np.asarray(a, dtype=np.float64)
    im2 = np.asarray(b, dtype=np.float64)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    npix = win_size ** 2
    cov_norm = npix / (npix - 1)
    ux = _uniform_filter(im1, win_size)
    uy = _uniform_filter(im2, win_size)
    uxx = _uniform_filter(im1 * im1, win_size)
    uyy = _uniform_filter(im2 * im2, win_size)
    uxy = _uniform_filter(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())


def psnr_jax(a, b, data_range: float = 255.0):
    """Batched PSNR on device: a, b (..., h, w) -> (...,) float32."""
    import jax.numpy as jnp

    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    err = jnp.mean((af - bf) ** 2, axis=(-2, -1))
    return 10.0 * jnp.log10((data_range ** 2) / err)
