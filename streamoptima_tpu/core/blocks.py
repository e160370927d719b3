"""Frame <-> block tiling and padding (pure reshapes, backend-agnostic).

Twin of the reference's blockshaped/unblockshaped (Encoder.py:158-172) and
pad/pad_hw (Encoder.py:129-155): frames become ``(n_blocks, bs, bs)`` in
raster order; padding extends to block multiples with value 128.
"""
from __future__ import annotations

import math

import numpy as np


def pad_hw(frame, h: int, w: int, multiple: int, pad_value: int = 128):
    """Pad ``frame`` (h, w) to the next multiple of ``multiple`` with pad_value.

    Twin of pad_hw (Encoder.py:140-155); returns the input unchanged when the
    dims already divide evenly (the reference copies to float64 — callers here
    keep integer dtypes; value-identical).
    """
    hr = math.ceil(h / multiple) * multiple
    wr = math.ceil(w / multiple) * multiple
    if (hr, wr) == frame.shape:
        return frame
    if isinstance(frame, np.ndarray):
        out = np.full((hr, wr), pad_value, dtype=frame.dtype)
        out[:h, :w] = frame
        return out
    import jax.numpy as jnp

    return jnp.pad(frame, ((0, hr - h), (0, wr - w)), constant_values=pad_value)


def blockify(frame, bs: int):
    """(h, w) -> (n_blocks, bs, bs) raster order (blockshaped, Encoder.py:158-165)."""
    h, w = frame.shape
    return frame.reshape(h // bs, bs, w // bs, bs).swapaxes(1, 2).reshape(-1, bs, bs)


def unblockify(blocks, h: int, w: int):
    """(n_blocks, bs, bs) -> (h, w) (unblockshaped, Encoder.py:167-172)."""
    _, bs, _ = blocks.shape
    return blocks.reshape(h // bs, w // bs, bs, bs).swapaxes(1, 2).reshape(h, w)


def split_quads(blocks, bs: int):
    """(nb, bs, bs) -> (nb, 4, bs/2, bs/2) sub-blocks in the reference's "Z"
    order: TL, TR, BL, BR (Encoder.py:517-519 loops y then x)."""
    nb = blocks.shape[0]
    s = bs // 2
    q = blocks.reshape(nb, 2, s, 2, s).swapaxes(2, 3).reshape(nb, 4, s, s)
    return q


def merge_quads(quads, bs: int):
    """(nb, 4, s, s) -> (nb, bs, bs), inverse of split_quads."""
    nb = quads.shape[0]
    s = bs // 2
    return quads.reshape(nb, 2, 2, s, s).swapaxes(2, 3).reshape(nb, bs, bs)
