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


def ssim_jax(a, b, win_size: int = 11, data_range: float = 255.0):
    """Batched SSIM on device: a, b (..., h, w) uint8 -> (...,) float32.

    Same algorithm as ``ssim`` (skimage defaults: uniform 11x11 filter,
    reflect boundaries, N/(N-1) covariance).  The window sums run on pixels
    shifted by -128 and are INTEGER-EXACT in float32 (|sum| <= 121*128^2 <
    2^24); the remaining float32 error is the uxx - ux^2 cancellation in the
    variance terms — measured <= ~4e-8 vs the float64 host twin (tested in
    test_jax_engine.py::test_ssim_jax_matches_host).
    """
    import jax.numpy as jnp

    x = a.astype(jnp.float32) - 128.0
    y = b.astype(jnp.float32) - 128.0
    pad = (win_size - 1) // 2

    def wsum(v):
        # reflect-pad then 2x separable moving sums via static shifted adds
        # (cumsum would overflow f32's 2^24 integer range across a full row)
        cfg_pad = [(0, 0)] * (v.ndim - 2) + [(pad, pad), (pad, pad)]
        vp = jnp.pad(v, cfg_pad, mode="reflect")
        h, w = v.shape[-2], v.shape[-1]
        rows = sum(vp[..., i : i + h, :] for i in range(win_size))
        return sum(rows[..., :, j : j + w] for j in range(win_size))

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    npix = win_size**2
    cov_norm = npix / (npix - 1)
    ux = wsum(x) / npix
    uy = wsum(y) / npix
    uxx = wsum(x * x) / npix
    uyy = wsum(y * y) / npix
    uxy = wsum(x * y) / npix
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    uxr = ux + 128.0  # luminance uses raw means (the shift is variance-only)
    uyr = uy + 128.0
    s = ((2 * uxr * uyr + c1) * (2 * vxy + c2)) / ((uxr**2 + uyr**2 + c1) * (vx + vy + c2))
    crop = s[..., pad:-pad, pad:-pad]
    return crop.mean(axis=(-2, -1))


def ssim_frames(y_frames, recon_frames, win_size: int = 11):
    """Per-frame SSIM for a whole clip; one batched device call when JAX is
    importable (the host scipy loop dominated 720p encodes, round-1 VERDICT
    item 10), host fallback otherwise."""
    try:
        import jax
        import jax.numpy as jnp

        a = jnp.asarray(np.asarray(y_frames))
        b = jnp.asarray(np.asarray(recon_frames))
        out = jax.jit(ssim_jax, static_argnames=("win_size",))(a, b, win_size=win_size)
        return [float(v) for v in np.asarray(out)]
    except ImportError:
        return [ssim(y_frames[i], recon_frames[i], win_size) for i in range(len(y_frames))]


def psnr_jax(a, b, data_range: float = 255.0):
    """Batched PSNR on device: a, b (..., h, w) -> (...,) float32."""
    import jax.numpy as jnp

    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    err = jnp.mean((af - bf) ** 2, axis=(-2, -1))
    return 10.0 * jnp.log10((data_range ** 2) / err)
