"""Pallas TPU kernels: full-search motion estimation (SAD + exact argmin).

The hottest op in the codec (SURVEY.md section 3.3 hot loop #1) as a hand-
scheduled TPU kernel: the frame is processed in bands of block rows; each
grid program DMAs its reference band from HBM (via 8 row-shifted planes so
every DMA start is sublane-aligned), streams all (ref, dy, dx) candidate
windows through the VPU — abs-diff, MXU 0/1-aggregation block sums (bf16
operands with a true f32 accumulator: exact for SADs < 2^24), and a
lexicographic (SAD, L1, ref, dx, dy) running minimum in VMEM.  No candidate
map ever touches HBM.

Half-pel (FME) support comes from the standard parity decomposition: the
2x-upsampled reference splits into 4 parity planes (even/odd rows x
even/odd cols); a displacement d = 2k + parity strides CONTIGUOUSLY through
its plane, so each plane is searched by the same whole-pel kernel with its
own static dx list / dynamic dy tables, and the 4 plane winners combine by
the same lexicographic order — bit-identical to the XLA kernels
(full_search_materialized / full_search_fused in core/me.py).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_INF32 = np.int32(2**31 - 1)


def _band_rows(nbr: int, w: int) -> int:
    """Block rows per program: largest divisor of nbr whose VMEM footprint
    (cur band + ref band + f32/bf16 diff temporaries, ~12 B/px) stays inside
    the 16 MB budget — 16 rows at 720p, 5 at 4K."""
    target = max(1, min(16, (16 * 1280) // max(w, 1)))
    for d in range(min(target, nbr), 0, -1):
        if nbr % d == 0:
            return d
    return 1


def _plane_search(cur, refs, ksr: int, bs: int, sub_bs: int, scale: int, fme: bool,
                  grid_dims, grid_sr: int, dx_list, dxi_list, dy_vals, dyi_vals,
                  nvalid, interpret: bool):
    """Search one (parity-)plane: plane displacement k in [-ksr, ksr] rows x
    the static ``dx_list`` columns.

    cur: (h, w) pixel frame; refs: (nref, h, w) plane (same grid as cur —
    plane row Y+k holds upsampled row scale*Y + dy).  Validity is evaluated
    in ORIGINAL ref-grid coordinates: position scale*X + dx against
    ``grid_dims`` with the reference's strict bounds (+2n FME bound when
    ``fme``), plus |d| <= grid_sr (the odd parity plane has one k with
    d out of range).  Returns (sad (nbr,nbc), sec, qsad (nbr2,nbc2), qsec)
    int32 grids; sec packs (L1, ref, dxi, dyi) exactly like
    core/me.py argmin_displacement.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur.shape
    nref = refs.shape[0]
    Hg, Wg = grid_dims
    nd_y = 2 * ksr + 1
    nd_x = len(dx_list)
    nbr, nbc = h // bs, w // bs
    nbr2, nbc2 = h // sub_bs, w // sub_bs
    band = _band_rows(nbr, w)
    band_px = band * bs
    nprog = nbr // band
    nbr2_b = band_px // sub_bs

    Wp = -(-(w + 2 * ksr) // 128) * 128  # DMA slice width must be 128-aligned
    refs_p = jnp.pad(refs.astype(jnp.int16), ((0, 0), (ksr, ksr + 8), (ksr, Wp - w - ksr)))
    Hp = h + 2 * ksr
    refs_shift = jnp.stack([refs_p[:, k : k + Hp, :] for k in range(8)], axis=1)
    nv = jnp.full((1, 1), nref if nvalid is None else nvalid, jnp.int32)
    dyv = jnp.asarray(np.asarray(dy_vals, np.int32))
    dyiv = jnp.asarray(np.asarray(dyi_vals, np.int32))

    def kernel(nv_ref, dyv_ref, dyiv_ref, cur_ref, refs_hbm, sad_o, sec_o, qsad_o, qsec_o,
               band_vmem, dma_sem):
        prog = pl.program_id(0)
        y0 = prog * band_px  # global pixel row of this band's first row
        cf32 = cur_ref[...].astype(jnp.float32)
        nvv = nv_ref[0, 0]

        col_sub = jax.lax.broadcasted_iota(jnp.int32, (1, nbc2), 1)  # sub-col idx
        row_sub = jax.lax.broadcasted_iota(jnp.int32, (nbr2_b, 1), 0)
        col_f = jax.lax.broadcasted_iota(jnp.int32, (1, nbc), 1)
        row_f = jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)

        # 0/1 aggregation matrices: the blocked sums run on the MXU (Mosaic
        # cannot lower lane-splitting reshapes).  bf16 operands are exact
        # (integers <= 255 / 0-1) and Pallas lowers to the MXU with a true
        # f32 accumulator, exact for sums < 2^24.
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

            def one_dy(kyi, best):
                dy = dyv_ref[kyi]  # original-grid displacement (traced)
                dyi = dyiv_ref[kyi]  # grid index for the secondary key
                absdy = jnp.where(dy < 0, -dy, dy)
                dy_ok = absdy <= grid_sr  # odd plane's extra k is no candidate
                # row shift at DMA time, from the (k mod 8) pre-shifted plane
                # so the start row is provably 8-aligned
                kk = jax.lax.rem(kyi, 8)
                start8 = pl.multiple_of(y0 + (kyi // 8) * 8, 8)
                dma = pltpu.make_async_copy(
                    refs_hbm.at[refi, kk, pl.ds(start8, band_px), :],
                    band_vmem,
                    dma_sem,
                )
                dma.start()
                dma.wait()
                rows = band_vmem[...]
                bsad, bsec, qsad, qsec = best["sad"], best["sec"], best["qsad"], best["qsec"]
                hi = jax.lax.Precision.HIGHEST
                for kxi in range(nd_x):
                    dx = dx_list[kxi]  # static original-grid displacement
                    dxi = dxi_list[kxi]
                    win = rows[:, kxi : kxi + w]
                    # abs in f32 (Mosaic has no vector integer abs); exact
                    # for |diff| <= 255, and exact in bf16 too (ints <= 256)
                    diff = jnp.abs(win.astype(jnp.float32) - cf32).astype(jnp.bfloat16)
                    t = jnp.dot(diff, col_agg, preferred_element_type=jnp.float32)  # (band_px, nbc2)
                    ss_f = jnp.dot(row_agg, t, preferred_element_type=jnp.float32, precision=hi)
                    fs_f = jnp.dot(row_pair, jnp.dot(ss_f, col_pair, preferred_element_type=jnp.float32, precision=hi),
                                   preferred_element_type=jnp.float32, precision=hi)  # (band, nbc)
                    ss = ss_f.astype(jnp.int32)
                    fs = fs_f.astype(jnp.int32)
                    l1 = (abs(dx) + absdy).astype(jnp.int32)
                    sec = (((l1 << 3) << 8 | dxi) << 8 | dyi) | jnp.int32(refi << 16)
                    # validity in original ref-grid coords (strict reference
                    # bounds; +2n FME bound when fme)
                    px_q = (col_sub * sub_bs) * scale + dx
                    py_q = ((row_sub + y0 // sub_bs) * sub_bs) * scale + dy
                    vq = (px_q >= 0) & (px_q < Wg - sub_bs) & (py_q >= 0) & (py_q < Hg - sub_bs)
                    if fme:
                        vq &= (px_q + 2 * sub_bs >= 0) & (px_q + 2 * sub_bs < Wg - sub_bs)
                        vq &= (py_q + 2 * sub_bs >= 0) & (py_q + 2 * sub_bs < Hg - sub_bs)
                    vq = vq & ref_ok & dy_ok
                    candq = jnp.where(vq, ss, _INF32)
                    upq = (candq < qsad) | ((candq == qsad) & (candq != _INF32) & (sec < qsec))
                    qsad = jnp.where(upq, candq, qsad)
                    qsec = jnp.where(upq, sec, qsec)
                    px_f = (col_f * bs) * scale + dx
                    py_f = ((row_f + y0 // bs) * bs) * scale + dy
                    vf = (px_f >= 0) & (px_f < Wg - bs) & (py_f >= 0) & (py_f < Hg - bs)
                    if fme:
                        vf &= (px_f + 2 * bs >= 0) & (px_f + 2 * bs < Wg - bs)
                        vf &= (py_f + 2 * bs >= 0) & (py_f + 2 * bs < Hg - bs)
                    vf = vf & ref_ok & dy_ok
                    cand = jnp.where(vf, fs, _INF32)
                    up = (cand < bsad) | ((cand == bsad) & (cand != _INF32) & (sec < bsec))
                    bsad = jnp.where(up, cand, bsad)
                    bsec = jnp.where(up, sec, bsec)
                return {"sad": bsad, "sec": bsec, "qsad": qsad, "qsec": qsec}

            return jax.lax.fori_loop(0, nd_y, one_dy, best)

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
            pl.BlockSpec((nd_y,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nd_y,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((band_px, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # shifted ref planes, HBM
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
    )(nv, dyv, dyiv, cur.astype(jnp.int16), refs_shift)
    return sad.reshape(nbr, nbc), sec.reshape(nbr, nbc), qsad.reshape(nbr2, nbc2), qsec.reshape(nbr2, nbc2)


def _unpack(sadv, secv, grid_sr: int):
    ok = sadv != _INF32
    wdy = (secv & 0xFF) - grid_sr
    wdx = ((secv >> 8) & 0xFF) - grid_sr
    wref = (secv >> 16) & 0x7
    zero = jnp.zeros_like(wdx)
    mv = jnp.stack(
        [jnp.where(ok, wdx, zero), jnp.where(ok, wdy, zero), jnp.where(ok, wref, zero)], axis=-1
    ).astype(jnp.int32)
    return mv, sadv, ok


def _assemble(planes, grid_sr: int, vbs: bool, nbr: int, nbc: int):
    """Lexicographic (sad, sec) combine of plane results + unpack."""
    sad = jnp.stack([p[0] for p in planes])
    sec = jnp.stack([p[1] for p in planes])
    best_sad = sad.min(axis=0)
    sec_m = jnp.where((sad == best_sad[None]) & (sad != _INF32), sec, _INF32)
    best_sec = sec_m.min(axis=0)
    mv, sadv, ok = _unpack(best_sad.reshape(-1), best_sec.reshape(-1), grid_sr)
    out = {"mv": mv, "sad": sadv, "ok": ok}
    if vbs:
        qsad = jnp.stack([p[2] for p in planes])
        qsec = jnp.stack([p[3] for p in planes])
        bq = qsad.min(axis=0)
        qm = jnp.where((qsad == bq[None]) & (qsad != _INF32), qsec, _INF32)
        bqs = qm.min(axis=0)
        smv, ssad, sok = _unpack(bq.reshape(-1), bqs.reshape(-1), grid_sr)
        nb = nbr * nbc

        def regroup(a, tail):
            a = a.reshape((nbr, 2, nbc, 2) + tail)
            return jnp.transpose(a, (0, 2, 1, 3) + tuple(range(4, 4 + len(tail)))).reshape((nb, 4) + tail)

        out["sub_mv"] = regroup(smv, (3,))
        out["sub_sad"] = regroup(ssad, ())
        out["sub_ok"] = regroup(sok, ())
    return out


@functools.partial(jax.jit, static_argnames=("sr", "bs", "sub_bs", "vbs", "interpret"))
def full_search_pallas(cur, refs, sr: int, bs: int, sub_bs: int, vbs: bool,
                       nvalid=None, interpret: bool = False):
    """Whole-pel full search over ``refs`` (nref, H, W); same contract and
    bit-identical results as core/me.py full_search_materialized."""
    h, w = cur.shape
    assert refs.shape[-2:] == (h, w)
    d = list(range(-sr, sr + 1))
    plane = _plane_search(
        cur, refs, sr, bs, sub_bs, 1, False, (h, w), sr,
        d, [x + sr for x in d], d, [y + sr for y in d], nvalid, interpret,
    )
    return _assemble([plane], sr, vbs, h // bs, w // bs)


@functools.partial(jax.jit, static_argnames=("sr", "bs", "sub_bs", "vbs", "interpret"))
def full_search_pallas_fme(cur, refs_up, sr: int, bs: int, sub_bs: int, vbs: bool,
                           nvalid=None, interpret: bool = False):
    """Half-pel full search over FME-upsampled refs (nref, 2H-1, 2W-1).

    ``sr`` is the config search range; the candidate grid is +-2*sr in
    half-pel units (the reference doubles the range under FME,
    Encoder.py:1649).  Each of the 4 parity planes is searched by the
    whole-pel kernel with its own static dx list / dy tables; plane winners
    combine lexicographically — bit-identical to the XLA FME search.
    """
    h, w = cur.shape
    assert refs_up.shape[-2:] == (2 * h - 1, 2 * w - 1)
    D = sr
    grid_sr = 2 * sr
    planes = []
    for py in (0, 1):
        for px in (0, 1):
            plane = refs_up[:, py::2, px::2]
            ph, pw = plane.shape[-2:]
            plane = jnp.pad(plane, ((0, 0), (0, h - ph), (0, w - pw)))
            ks = list(range(-D, D + 1))
            dx_all = [2 * k + px for k in ks]
            keep = [i for i, dxv in enumerate(dx_all) if abs(dxv) <= grid_sr]
            dx_list = [dx_all[i] for i in keep]
            dxi_list = [dx_all[i] + grid_sr for i in keep]
            dy_vals = [2 * k + py for k in ks]  # odd plane's k=D masked in-kernel
            dyi_vals = [min(v + grid_sr, 2 * grid_sr) for v in dy_vals]
            planes.append(
                _plane_search(
                    cur, plane, D, bs, sub_bs, 2, True, (2 * h - 1, 2 * w - 1), grid_sr,
                    dx_list, dxi_list, dy_vals, dyi_vals, nvalid, interpret,
                )
            )
    return _assemble(planes, grid_sr, vbs, h // bs, w // bs)
