"""Pallas TPU kernel: full-search motion estimation (SAD + exact argmin).

The hottest op in the codec (SURVEY.md section 3.3 hot loop #1) as a hand-
scheduled TPU kernel: the frame is processed in bands of block rows; each
grid program DMAs its reference band (with a +-search_range halo) from HBM
into VMEM once, then streams all (ref, dy, dx) candidate windows through the
VPU — abs-diff, minor-axis-first blocked sums, and a lexicographic
(SAD, L1, ref, dx, dy) running minimum held in VMEM scratch.  No candidate
map ever touches HBM.

Bit-identical to core/me.py's full_search_materialized / full_search_fused
(same winner ordering, bounds quirks, and INT32_MAX sentinel).  Whole-pel
only (the FME half-pel path stays on the XLA kernels); the caller dispatches
via CodecConfig.me_search = "pallas".
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_INF32 = np.int32(2**31 - 1)


def _band_rows(nbr: int, target: int = 16) -> int:
    """Largest divisor of nbr that is <= target (block rows per program)."""
    for d in range(min(target, nbr), 0, -1):
        if nbr % d == 0:
            return d
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("sr", "bs", "sub_bs", "vbs", "interpret"),
)
def full_search_pallas(cur, refs, sr: int, bs: int, sub_bs: int, vbs: bool,
                       nvalid=None, interpret: bool = False):
    """Whole-pel full search over ``refs`` (nref, H, W).

    Returns the same dict as full_search_materialized: mv (nb, 3) [dx, dy,
    ref], sad, ok (+ sub_mv/sub_sad/sub_ok at quad granularity when ``vbs``).
    ``nvalid`` (traced int32) masks refs[i >= nvalid]; ``interpret`` runs the
    kernel in interpreter mode (CPU tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur.shape
    nref, H, W = refs.shape
    assert (H, W) == (h, w), "whole-pel search: ref and cur share the frame grid"
    nd = 2 * sr + 1
    nbr, nbc = h // bs, w // bs
    nbr2, nbc2 = h // sub_bs, w // sub_bs
    band = _band_rows(nbr)  # block rows per program
    band_px = band * bs
    nprog = nbr // band
    nbr2_b = band_px // sub_bs

    # pad refs by sr on every side so each band's halo read is in-range, then
    # materialize 8 row-shifted copies: Mosaic requires DMA row starts that
    # are provably 8-aligned, so the kernel reads plane (dy mod 8) at the
    # aligned row y0 + 8*(dy//8) — refs_shift[k][r] == refs_pad[r + k]
    Wp = -(-(w + 2 * sr) // 128) * 128  # DMA slice width must be 128-aligned
    refs_p = jnp.pad(refs.astype(jnp.int16), ((0, 0), (sr, sr + 8), (sr, Wp - w - sr)))
    Hp = h + 2 * sr
    refs_shift = jnp.stack([refs_p[:, k : k + Hp, :] for k in range(8)], axis=1)
    nv = jnp.full((1, 1), nref if nvalid is None else nvalid, jnp.int32)

    def kernel(nv_ref, cur_ref, refs_hbm, sad_o, sec_o, qsad_o, qsec_o, band_vmem, dma_sem):
        prog = pl.program_id(0)
        y0 = prog * band_px  # global pixel row of this band's first row
        cf32 = cur_ref[...].astype(jnp.float32)
        nvv = nv_ref[0, 0]

        col_sub = jax.lax.broadcasted_iota(jnp.int32, (1, nbc2), 1)  # sub-col idx
        row_sub = jax.lax.broadcasted_iota(jnp.int32, (nbr2_b, 1), 0)

        # 0/1 aggregation matrices: the blocked sums run on the MXU (Mosaic
        # cannot lower lane-splitting reshapes).  f32 here is EXACT: |diff|
        # <= 255 and 0/1 are exact f32 values, every product is exact, and
        # f32 accumulation of sums < 2^24 never rounds.  (bf16 inputs would
        # NOT be exact: the MXU then accumulates in reduced precision.)
        def agg(n_out, n_in, group):
            a = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0) // group
            b = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
            return (a == b).astype(jnp.float32)

        col_agg = agg(nbc2, w, sub_bs).astype(jnp.bfloat16)  # (w, nbc2)
        row_agg = agg(nbr2_b, band_px, sub_bs).T  # (nbr2_b, band_px)
        col_pair = agg(nbc, nbc2, 2)  # (nbc2, nbc)
        row_pair = agg(band, nbr2_b, 2).T  # (band, nbr2_b)

        best = {
            "sad": jnp.full((band, nbc), _INF32, jnp.int32),
            "sec": jnp.full((band, nbc), _INF32, jnp.int32),
            "qsad": jnp.full((nbr2_b, nbc2), _INF32, jnp.int32),
            "qsec": jnp.full((nbr2_b, nbc2), _INF32, jnp.int32),
        }

        def one_ref(refi, best):
            ref_ok = refi < nvv

            def one_dy(dyi, best):
                # dy row shift at DMA time, from the (dy mod 8) pre-shifted
                # plane so the start row is provably 8-aligned
                kk = jax.lax.rem(dyi, 8)
                start8 = pl.multiple_of(y0 + (dyi // 8) * 8, 8)
                dma = pltpu.make_async_copy(
                    refs_hbm.at[refi, kk, pl.ds(start8, band_px), :],
                    band_vmem,
                    dma_sem,
                )
                dma.start()
                dma.wait()
                rows = band_vmem[...]
                bsad, bsec, qsad, qsec = best["sad"], best["sec"], best["qsad"], best["qsec"]
                for dxi in range(nd):
                    dx = dxi - sr
                    dy = dyi - sr
                    win = rows[:, dxi : dxi + w]
                    # abs in f32 (Mosaic has no vector integer abs); exact for
                    # |diff| <= 255, and exact in bf16 too (integers <= 256)
                    diff = jnp.abs(win.astype(jnp.float32) - cf32).astype(jnp.bfloat16)
                    # Precision.HIGHEST: the MXU's default f32 path is a
                    # single bf16 pass (inexact); the 3-pass decomposition is
                    # error-free for these integer-valued operands
                    # bf16 operands are exact here (integers <= 255 / 0-1)
                    # and Pallas lowers to the MXU with a true f32
                    # accumulator; the small follow-up dots stay f32/HIGHEST
                    hi = jax.lax.Precision.HIGHEST
                    t = jnp.dot(diff, col_agg, preferred_element_type=jnp.float32)  # (band_px, nbc2)
                    ss_f = jnp.dot(row_agg, t, preferred_element_type=jnp.float32, precision=hi)  # (nbr2_b, nbc2)
                    fs_f = jnp.dot(row_pair, jnp.dot(ss_f, col_pair, preferred_element_type=jnp.float32, precision=hi),
                                   preferred_element_type=jnp.float32, precision=hi)  # (band, nbc)
                    ss = ss_f.astype(jnp.int32)
                    fs = fs_f.astype(jnp.int32)
                    l1 = abs(dx) + abs(dy)
                    sec = jnp.int32((((l1 << 3) | 0) << 8 | dxi) << 8 | dyi) | jnp.int32(refi << 16)
                    # validity: 0 <= x+dx < W - n and 0 <= y+dy < H - n (strict)
                    px_q = col_sub * sub_bs + dx
                    py_q = (row_sub + (y0 // sub_bs)) * sub_bs + dy
                    vq = (px_q >= 0) & (px_q < w - sub_bs) & (py_q >= 0) & (py_q < h - sub_bs) & ref_ok
                    candq = jnp.where(vq, ss, _INF32)
                    upq = (candq < qsad) | ((candq == qsad) & (candq != _INF32) & (sec < qsec))
                    qsad = jnp.where(upq, candq, qsad)
                    qsec = jnp.where(upq, sec, qsec)
                    px_f = jax.lax.broadcasted_iota(jnp.int32, (1, nbc), 1) * bs + dx
                    py_f = (jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0) + y0 // bs) * bs + dy
                    vf = (px_f >= 0) & (px_f < w - bs) & (py_f >= 0) & (py_f < h - bs) & ref_ok
                    cand = jnp.where(vf, fs, _INF32)
                    up = (cand < bsad) | ((cand == bsad) & (cand != _INF32) & (sec < bsec))
                    bsad = jnp.where(up, cand, bsad)
                    bsec = jnp.where(up, sec, bsec)
                return {"sad": bsad, "sec": bsec, "qsad": qsad, "qsec": qsec}

            return jax.lax.fori_loop(0, nd, one_dy, best)

        for refi in range(nref):  # static unroll: nref is small
            best = one_ref(refi, best)

        sad_o[0] = best["sad"]
        sec_o[0] = best["sec"]
        qsad_o[0] = best["qsad"]
        qsec_o[0] = best["qsec"]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((band_px, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded refs stay in HBM
        ],
        out_specs=[  # 3D blocks: trailing dims equal the array dims (tileable)
            pl.BlockSpec((1, band, nbc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, nbc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbr2_b, nbc2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbr2_b, nbc2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((band_px, Wp), jnp.int16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    sad, sec, qsad, qsec = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nprog, band, nbc), jnp.int32),
            jax.ShapeDtypeStruct((nprog, band, nbc), jnp.int32),
            jax.ShapeDtypeStruct((nprog, nbr2_b, nbc2), jnp.int32),
            jax.ShapeDtypeStruct((nprog, nbr2_b, nbc2), jnp.int32),
        ],
        interpret=interpret,
    )(nv, cur.astype(jnp.int16), refs_shift)

    def unpack(sadv, secv):
        ok = sadv != _INF32
        wdy = (secv & 0xFF) - sr
        wdx = ((secv >> 8) & 0xFF) - sr
        wref = (secv >> 16) & 0x7
        zero = jnp.zeros_like(wdx)
        mv = jnp.stack(
            [jnp.where(ok, wdx, zero), jnp.where(ok, wdy, zero), jnp.where(ok, wref, zero)], axis=-1
        ).astype(jnp.int32)
        return mv, sadv, ok

    mv, sadv, ok = unpack(sad.reshape(-1), sec.reshape(-1))  # (nprog, band, nbc) raster == (nbr, nbc) raster
    out = {"mv": mv, "sad": sadv, "ok": ok}
    if vbs:
        nb = nbr * nbc

        def regroup(a, tail):
            a = a.reshape((nbr, 2, nbc, 2) + tail)
            return jnp.transpose(a, (0, 2, 1, 3) + tuple(range(4, 4 + len(tail)))).reshape((nb, 4) + tail)

        smv, ssad, sok = unpack(qsad.reshape(-1), qsec.reshape(-1))
        out["sub_mv"] = regroup(smv, (3,))
        out["sub_sad"] = regroup(ssad, ())
        out["sub_ok"] = regroup(sok, ())
    return out
