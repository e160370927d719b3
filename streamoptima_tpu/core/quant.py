"""Quantization: banded power-of-two Q matrices and exact rounding.

The reference builds ``Q[x,y] = 2**(QP + band)`` with ``band`` 0 below the
anti-diagonal, 1 on it, 2 above (Encoder.py:938-945), then quantizes with
``round(TC / Q)`` (numpy round == half-to-even, Encoder.py:787-789) and
rescales with ``QTC * Q`` (Encoder.py:820-821).

Because every Q entry is a power of two, quantization is exactly a
round-half-even arithmetic shift — implemented here with pure integer ops so
the result is bit-identical on every backend, including for negative values
and the half-way ties numpy resolves to even.
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def q_exponent_matrix(n: int) -> np.ndarray:
    """Band exponents: 0 if x+y < n-1, 1 if == n-1, else 2 (Encoder.py:938-945)."""
    i = np.add.outer(np.arange(n), np.arange(n))
    return np.where(i < n - 1, 0, np.where(i == n - 1, 1, 2)).astype(np.int32)


def generate_q_matrix(n: int, qp: int) -> np.ndarray:
    """Bit-exact twin of generate_Q_matrix (Encoder.py:938-945), int64 values."""
    return (1 << (qp + q_exponent_matrix(n).astype(np.int64)))


def qpm1(qp: int) -> int:
    """Sub-block QP: max(qp-1, qp if qp<=0) (Encoder.py:71-76, :948-959)."""
    return qp - 1 if qp > 0 else qp


def rhe_shift_right(num, k):
    """round-half-even(num / 2**k) for int arrays; ``k`` int array or scalar >= 0.

    Works on NumPy and JAX arrays (operators only).  Arithmetic right shift
    floors, and ``num - (q << k)`` is the non-negative remainder, so the
    half-even adjustment is exact for negative ``num`` too.
    """
    if isinstance(k, (int, np.integer)) and k == 0:
        return num
    kc = np.maximum(k, 1) if isinstance(k, (int, np.integer, np.ndarray)) else k.clip(1)
    q = num >> kc
    r = num - (q << kc)
    half = 1 << (kc - 1)
    inc = (r > half) | ((r == half) & ((q & 1) == 1))
    out = q + inc.astype(num.dtype)
    if isinstance(k, (int, np.integer)):
        return out
    where = np.where if isinstance(num, np.ndarray) and isinstance(k, np.ndarray) else _jnp_where
    return where(k == 0, num, out)


def _jnp_where(cond, a, b):
    import jax.numpy as jnp

    return jnp.where(cond, a, b)


def quantize(tc, qp, n: int | None = None):
    """QTC = round-half-even(TC / 2**(qp+band)); exact twin of quantize_TC.

    ``tc``: int blocks (..., n, n); ``qp`` scalar int or broadcastable array of
    per-block QPs shaped (...,) (ROI / per-row rate control).
    """
    if n is None:
        n = tc.shape[-1]
    band = q_exponent_matrix(n)
    if not isinstance(tc, np.ndarray):
        import jax.numpy as jnp

        band = jnp.asarray(band)
    if np.ndim(qp) == 0 and isinstance(qp, (int, np.integer)):
        k = band + int(qp)
    else:
        k = band + qp[..., None, None]
    return rhe_shift_right(tc, k)


def rescale(qtc, qp, n: int | None = None):
    """QTC * Q as exact shifts (rescale_QTC, Encoder.py:820-821)."""
    if n is None:
        n = qtc.shape[-1]
    band = q_exponent_matrix(n)
    if not isinstance(qtc, np.ndarray):
        import jax.numpy as jnp

        band = jnp.asarray(band)
    if np.ndim(qp) == 0 and isinstance(qp, (int, np.integer)):
        k = band + int(qp)
    else:
        k = band + qp[..., None, None]
    return qtc << k
