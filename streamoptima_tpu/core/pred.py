"""Inter prediction gather + residual/reconstruction primitives.

Replicates the three boundary cases of calculate_inter_frame_residual
(Encoder.py:432-460), reconstruct_frame (Encoder.py:831-932) and
decode_frame_inter (decoder.py:97-211):

A. window fully valid (and under FME also the +2bs check passes): the
   predicted block is the (stride-2 under FME) window at (py, px);
B. FME only: primary bounds ok but the +2bs check fails -> all-128 block
   (Encoder.py:450, :867);
C. primary bounds fail -> handle_boundary_conditions (Encoder.py:750-768):
   contiguous stride-1 window, zero-padded outside the frame - even under
   FME (the reference ignores the half-pel stride in this fallback).

Validity (strict, the reference off-by-one): 0 <= px < W - bs and
0 <= py < H - bs; FME extra: 0 <= px + 2bs < W - bs (same for y).
"""
from __future__ import annotations

import numpy as np


def gather_predictions(mvs, ref_stack, bx, by, bs: int, fme: bool, xp, fme_margin: int | None = None,
                       grid_dims=None, origin_row=0):
    """Predicted blocks for chosen MVs.

    mvs: (nb, 3) int32 [dx, dy, ref]; ref_stack: (nref, H, W) int (the FME
    upsampled frames when ``fme``); bx, by: (nb,) block top-left pixel coords
    (un-doubled).  Returns (nb, bs, bs) int32.

    ``fme_margin``: subtrahend of the FME overflow check
    ``0 <= p + 2*bs < W - fme_margin`` (default ``bs``).  The reference uses
    ``bs`` on the residual path (Encoder.py:447) but the *parent* block size
    (= 2*bs for VBS quads) on the reconstruction/decode path (Encoder.py:910,
    decoder.py:185), so quads near the right/bottom edge can be predicted
    from a real window at residual time but from 128s at reconstruction.

    ``grid_dims``/``origin_row``: when ``ref_stack`` is a halo band of the
    frame (row-sharded tiles), grid_dims is the FULL ref-grid (H, W) used for
    all validity/clipping decisions and origin_row the band's first row in
    ref-grid units; every in-frame read must land inside the band (the halo
    must cover the search range).
    """
    if grid_dims is None:
        H, W = ref_stack.shape[-2:]
    else:
        H, W = grid_dims
    band_h = ref_stack.shape[-2]
    scale = 2 if fme else 1
    px = scale * bx + mvs[:, 0]
    py = scale * by + mvs[:, 1]
    ref = mvs[:, 2]
    i = xp.arange(bs)
    valid1 = (px >= 0) & (px < W - bs) & (py >= 0) & (py < H - bs)

    def band_rows(rc_global):
        # global (already frame-clipped) rows -> band indices; the extra clip
        # only guards reads whose values are masked anyway
        return xp.clip(rc_global - origin_row, 0, band_h - 1)

    # contiguous clamped gather, zeros outside (cases A non-FME and C)
    rows = py[:, None] + i[None, :]  # (nb, bs)
    cols = px[:, None] + i[None, :]
    rin = (rows >= 0) & (rows < H)
    cin = (cols >= 0) & (cols < W)
    rc = band_rows(xp.clip(rows, 0, H - 1))
    cc = xp.clip(cols, 0, W - 1)
    g1 = ref_stack[ref[:, None, None], rc[:, :, None], cc[:, None, :]]
    g1 = xp.where(rin[:, :, None] & cin[:, None, :], g1, 0)

    if not fme:
        return g1.astype(xp.int32)

    m = bs if fme_margin is None else fme_margin
    valid2 = (
        (px + 2 * bs >= 0)
        & (px + 2 * bs < W - m)
        & (py + 2 * bs >= 0)
        & (py + 2 * bs < H - m)
    )
    rows2 = band_rows(xp.clip(py[:, None] + 2 * i[None, :], 0, H - 1))
    cols2 = xp.clip(px[:, None] + 2 * i[None, :], 0, W - 1)
    g2 = ref_stack[ref[:, None, None], rows2[:, :, None], cols2[:, None, :]]
    out = xp.where(
        valid1[:, None, None],
        xp.where(valid2[:, None, None], g2, 128),
        g1,
    )
    return out.astype(xp.int32)


def wrap_uint8(x, xp):
    """(pred + residual).astype(np.uint8) semantics: wrap modulo 256
    (Encoder.py:827; values are always integer-valued)."""
    return (x & 255).astype(xp.uint8)
