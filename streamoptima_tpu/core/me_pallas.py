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
(full_search_materialized / full_search_fused in core/me.py).  The planes
are computed DIRECTLY from the reference pixels (core/me.fme_parity_planes);
materializing the (2H-1, 2W-1) upsample and strided-slicing it back lowers
to XLA gathers at ~2 GiB/s (measured 38 ms/frame at 720p).

The kernels also RETURN THE WINNING PREDICTION PIXELS (``want_pred``): every
candidate window is already streaming through VMEM, so the winner's pixels
are kept by a masked select (block-mask -> pixel-mask via two 0/1 MXU
matmuls) instead of re-fetching them afterwards with an XLA gather (measured
~40 ms/frame at 720p VBS+FME for the full+quad prediction gathers).

Row-sharded tiles (parallel/mesh.py) are supported natively: ``refs`` may be
a halo band taller than ``cur`` — ``read_row0`` (8-aligned) locates cur's
first row inside the band and ``g_px0`` its global frame row; candidate
validity is evaluated against ``grid_dims`` in global coordinates, exactly
like core/me.py's row_offset/grid_dims contract.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from streamoptima_tpu.core import me as M

_INF32 = np.int32(2**31 - 1)


# Measured-safe band heights: (w_t, ncol, kind, nd, fme) -> tallest band that
# COMPILED on the real chip (benchmarks/vmem_probe.py, compile-only AOT probes;
# a Mosaic scoped-VMEM OOM reports the exact attempted size, so each class is
# bracketed by an OK band and the OOM one row taller where listed).  kind is
# "argmin" (no pred outputs), "pred" (full-block winner pixels) or "qpred"
# (full + quad winner pixels).  fme entries are measured with the parity-plane
# kernel; an fme=True entry is safe for fme=False too (measured: the fme
# kernel's scoped footprint is strictly larger at equal shape — e.g.
# (w_t=1920, ncol=2, pred) fits band 9 at fme=0 but OOMs at fme=1).
_MEASURED_MAX_BAND = {
    (1280, 1, "qpred", 17, True): 13,   # 14 OOM 16.60M
    (1280, 1, "qpred", 33, True): 7,    # 8 OOM 16.20M
    (1280, 1, "pred", 17, True): 16,
    (1280, 1, "pred", 17, False): 16,   # production 720p plain
    (1280, 1, "pred", 33, False): 10,   # production 720p plain sr16 (97 fps)
    (1280, 1, "argmin", 17, True): 24,
    (1280, 1, "argmin", 33, True): 16,
    (1920, 1, "qpred", 17, True): 8,    # 9 OOM 16.73M, 10 OOM 18.18M
    (1920, 1, "pred", 17, True): 10,    # 12 OOM 16.04M
    (1920, 1, "pred", 17, False): 11,   # production 1080p plain (model pick)
    (1920, 1, "argmin", 17, True): 20,  # 23 OOM 16.12M
    (1920, 2, "pred", 17, True): 8,
    (1920, 2, "pred", 17, False): 9,    # 10 OOM 16.03M; production 4K plain
    (1920, 2, "argmin", 17, True): 20,  # 24 OOM 17.58M
    (1280, 3, "qpred", 17, True): 10,   # 11 OOM 16.74M, 13 OOM 18.69M
    (640, 2, "qpred", 33, True): 12,    # 720p sr16 forced-inkernel selection
    # round-4 closure probes (VERDICT r3 item 6): the sr=16 classes at
    # 1080p/4K and the remaining production selections, each a compiled-OK
    # on the chip (vmem_probe); brackets noted where an OOM bounds the class
    (1280, 1, "pred", 33, True): 11,    # 720p sr16 fme plain
    (1920, 1, "pred", 33, True): 8,     # 1080p sr16 plain
    (1920, 1, "qpred", 33, True): 6,    # 1080p sr16 inkernel VBS
    (1920, 1, "argmin", 33, True): 16,  # 1080p sr16 argmin/fetch
    (1920, 2, "pred", 33, True): 7,     # 4K sr16 plain
    (1920, 2, "qpred", 33, True): 6,    # 4K sr16 inkernel VBS
    (1920, 2, "argmin", 33, True): 18,  # 4K sr16 argmin/fetch
    (1920, 2, "qpred", 17, True): 8,    # 9 OOM 16.52M; 4K inkernel VBS
    (640, 3, "qpred", 33, True): 11,    # 1080p sr16 inkernel selection
    (768, 5, "pred", 33, False): 9,     # 4K sr16 plain selection
}


def _band_rows(nbr: int, w: int, bs: int = 16, want_pred: bool = False,
               want_qpred: bool = False, nd: int = 17, budget_mb: float = 15.0,
               ncol: int = 1, fme: bool = True) -> int:
    """Block rows per program.  Probed shape classes use the measured-safe
    table above; everything else falls back to a conservative analytic model.

    The round-3 compile-probe sweep (benchmarks/vmem_probe.py) refit the
    model against 12 bracketed on-chip Mosaic allocations:
      scoped ~= const(kind) + 1.2M * (ncol - 1) + band_px * w_t * slope(nd)
    - qpred slope = 12.5 + 2.06*nd B/px (two independent OOM pairs at
      w=1280 and w=1920 agree on 47.5 B/px at nd=17; the nd=33 point pins
      the split), const ~= 3.6M and FLAT in w_t — the old w^2/4 term was a
      misattribution (w=1280 and w=1920 fit the same constant).
    - pred-only sits between qpred and argmin; bracketed at (1920, 10 OK /
      12 OOM), modeled with the qpred slope minus one pixel band
      (16 B/px at nd=17).
    - argmin has a small slope (~0.26M/row at w=1920 from the 23-OOM /
      20-OK + ncol=2 24-OOM pair => ~8.9 B/px at nd=17) and a ~10M
      constant; unprobed argmin classes keep the legacy <=16 cap.
    The 1.2M-per-extra-column-tile penalty is re-confirmed by the
    (1280, ncol=3, qpred) pair vs its untiled sibling (6.01M vs 3.61M
    const = 2 x 1.2M)."""
    kind = "qpred" if want_qpred else ("pred" if want_pred else "argmin")
    hit = _MEASURED_MAX_BAND.get((w, ncol, kind, nd, fme))
    if hit is None and not fme:
        hit = _MEASURED_MAX_BAND.get((w, ncol, kind, nd, True))
    if hit is not None:
        return min(hit, nbr)
    budget = int(budget_mb * 2**20)
    if want_qpred:
        const, slope = int(3.7 * 2**20), (12.5 + 2.06 * nd) * 1.15
    elif want_pred:
        const, slope = int(3.7 * 2**20), max(12.5 + 2.06 * nd - 16.0, 8.0) * 1.15
    else:
        # unprobed argmin shapes keep the legacy model (never OOM'd in
        # production; the fitted ~10M constant is a single-width estimate we
        # don't trust to extrapolate) — probed classes ride the table above
        const, slope = (w * w) // 4, 8.0 + 1.2 * nd
    const += int(1.2 * 2**20) * (ncol - 1)
    if const >= budget:
        return 1
    cap = max(1, int((budget - const) / (w * slope) // bs))
    # the band need not divide nbr: _plane_search pads the frame's block
    # rows up to a multiple and slices the outputs back (round-2 VERDICT
    # item 3 — 4K's nbr=135 has a sparse divisor set, which used to collapse
    # bands to 5 rows where VMEM allowed 8+)
    return min(cap, 16, nbr)


# SAD-aggregation order inside the search kernel: "auto" picks per shape by
# the MXU tile-cycle model in _agg_row_first; "row"/"col" force it (A/B).
_AGG_ORDER = "auto"


def _agg_row_first(band_px: int, w_t: int, sub_bs: int) -> bool:
    """True when row-first SAD aggregation models cheaper on the MXU.

    The per-candidate block sums can aggregate columns first
    (``diff @ col_agg`` then ``row_agg @ t``) or rows first
    (``row_agg @ diff`` then an exact hi/lo-split ``@ col_agg``).  Column-
    first streams band_px rows through ceil(w_t/128)*ceil(nbc2_t/128) weight
    tiles per candidate — ~2*nbc2_t FLOPs/px (480 at a 1920-wide 4K tile);
    row-first costs ~2*nbr2_b FLOPs/px on bands that are short and wide
    (every production shape: bands are 7-24 block rows, tiles 352-1920 px).
    Model: matmul (M,K)@(K,N) ~ ceil(K/128)*ceil(N/128)*M cycles; the
    column-first second matmul is f32 x f32 HIGHEST (~6 bf16 passes), the
    row-first second is 2 bf16 passes (explicit hi/lo split).

    Measured (GOP-scan A/B on chip, round 3; auto picks row at every
    production shape and the model agrees): 720p plain 261 -> 297 fps,
    720p VBS+FME 125.6 -> 155, 1080p VBS+FME 54 -> 75, 4K plain
    37.4 -> 42.8, 4K VBS+FME 15.3 -> 18.7.  On-chip bit-parity vs the
    fused XLA kernels at all four smoke shapes; interpret-mode row==col
    bit-parity on both whole-pel and FME paths."""
    nbr2_b = band_px // sub_bs
    nbc2_t = w_t // sub_bs
    tiles = lambda k, n: -(-k // 128) * -(-n // 128)  # noqa: E731
    col = tiles(w_t, nbc2_t) * band_px + 6 * tiles(band_px, nbc2_t) * nbr2_b
    row = tiles(band_px, w_t) * nbr2_b + tiles(w_t, nbc2_t) * 2 * nbr2_b
    return row < col


def _col_tiles(w: int, nbr: int, bs: int, want_pred: bool, want_qpred: bool, nd: int,
               fme: bool = True):
    """(column tiles, band rows): the LARGEST tile (smallest ncol) whose
    VMEM-modeled band reaches >= 8 block rows wins; tiles are 128-aligned
    and >= 512 px wide.

    An earlier cost rule preferred the smallest admissible tile, reasoning
    the column-aggregation matmul costs 2*w_t/8 FLOPs per pixel per
    candidate.  GOP-scan A/B on the chip (round 3) refuted it at every
    supported shape: 720p plain 261 fps untiled vs 219 at ncol=2; 720p
    VBS+FME 123 vs 101; 1080p VBS+FME 54 untiled vs 45 at ncol=3; 4K plain
    37.4 at ncol=2 vs 31.9 at ncol=6; 4K VBS+FME 13.5 at ncol=2 vs 11.8 at
    ncol=6 — per-program fixed costs and the halo re-read dominate whatever
    the narrower aggregation matmuls save.  Tiling therefore exists ONLY to
    rescue the band height: the w_t^2/4-byte agg/expansion matrices scale
    quadratically with tile width and collapse 4K-with-predictions to 1-2
    row bands untiled (measured 4.5 -> 8.1 fps going untiled -> ncol=2 in
    round 2).  The >= 8-row bar is where the measured curve flattens; below
    it, narrower tiles (whose per-tile matrices shrink quadratically while
    the penalty grows only linearly) recover taller bands.

    If no candidate reaches 8 rows, the largest-band (then widest-tile)
    candidate with >= min(4, nbr) rows wins, falling back to untiled."""
    cands = []
    for ncol in (1, 2, 3, 4, 5, 6, 7, 8):
        w_t = w // ncol
        if ncol > 1 and (w % ncol or w_t % 128 or w_t < 512):
            continue
        band = _band_rows(nbr, w_t, bs, want_pred, want_qpred, nd,
                          budget_mb=15.8, ncol=ncol, fme=fme)
        cands.append((ncol, band))
    for ncol, band in cands:  # ascending ncol = descending tile width
        if band >= min(8, nbr):
            return ncol, band
    ok = [(ncol, band) for ncol, band in cands if band >= min(4, nbr)]
    if ok:
        return max(ok, key=lambda cb: (cb[1], -cb[0]))
    return cands[0]


def _plane_search(cur, refs, ksr: int, bs: int, sub_bs: int, scale: int, fme: bool,
                  grid_dims, grid_sr: int, dx_list, dxi_list, dy_vals, dyi_vals,
                  nvalid, interpret: bool, read_row0=0, g_px0=0,
                  want_pred: bool = False, want_qpred: bool = False):
    """Search one (parity-)plane: plane displacement k in [-ksr, ksr] rows x
    the static ``dx_list`` columns.

    cur: (h, w) pixel band; refs: (nref, bandh, w) plane band with
    bandh >= read_row0 + h (cur row i lives at plane row read_row0 + i; the
    extra rows are halo).  Validity is evaluated in GLOBAL ref-grid
    coordinates: position (scale*(g_px0 + y) + dy, scale*x + dx) against
    ``grid_dims`` with the reference's strict bounds (+2n FME bound when
    ``fme``), plus |d| <= grid_sr (the odd parity plane has one k with d out
    of range).  Returns (sad (nbr,nbc), sec, qsad (nbr2,nbc2), qsec[, predf
    (h,w), predq (h,w)]) where sec packs (L1, ref, dxi, dyi) exactly like
    core/me.py argmin_displacement and predf/predq hold the winning
    candidate's window pixels (blocks with no valid candidate hold zeros —
    mask with ``ok`` outside).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = cur.shape
    nref, bandh = refs.shape[0], refs.shape[1]
    Hg, Wg = grid_dims
    nd_y = 2 * ksr + 1
    nd_x = len(dx_list)
    nbr, nbc = h // bs, w // bs
    nbr2, nbc2 = h // sub_bs, w // sub_bs
    ncol, band = _col_tiles(w, nbr, bs, want_pred, want_qpred, max(nd_y, nd_x), fme)
    w_t = w // ncol
    nbc_t, nbc2_t = w_t // bs, w_t // sub_bs
    band_px = band * bs
    row_first = (_agg_row_first(band_px, w_t, sub_bs) if _AGG_ORDER == "auto"
                 else _AGG_ORDER == "row")
    # the band is VMEM-sized, not a divisor of nbr: pad the block rows up to
    # a multiple (the pad rows' blocks are invalid in global coordinates and
    # sliced off below) — 4K's nbr=135 otherwise collapses to 5-row bands
    nprog = -(-nbr // band)
    row_pad = nprog * band_px - h
    if row_pad:
        cur = jnp.pad(cur, ((0, row_pad), (0, 0)))
    nbr2_b = band_px // sub_bs

    # per-tile DMA slice: 128-aligned width w_t + 2*ksr rounded up; the plane
    # is padded so the LAST tile's slice stays in bounds
    wtp = -(-(w_t + 2 * ksr) // 128) * 128
    Wp = (ncol - 1) * w_t + wtp  # == old full-width pad when ncol == 1
    refs_p = jnp.pad(refs.astype(jnp.int16), ((0, 0), (ksr, ksr + 8 + row_pad), (ksr, Wp - w - ksr)))
    Hp = bandh + 2 * ksr + row_pad
    refs_shift = jnp.stack([refs_p[:, k : k + Hp, :] for k in range(8)], axis=1)
    scalars = jnp.stack([
        jnp.asarray(nref if nvalid is None else nvalid, jnp.int32),
        jnp.asarray(read_row0, jnp.int32),
        jnp.asarray(g_px0, jnp.int32),
    ]).reshape(1, 3)
    dyv = jnp.asarray(np.asarray(dy_vals, np.int32))
    dyiv = jnp.asarray(np.asarray(dyi_vals, np.int32))

    def kernel(sc_ref, dyv_ref, dyiv_ref, cur_ref, refs_hbm, *out_refs):
        band_vmem, dma_sem = out_refs[-2], out_refs[-1]
        outs = out_refs[:-2]
        prog = pl.program_id(0)
        ctile = pl.program_id(1)  # column tile (always 0 when ncol == 1)
        y0 = prog * band_px  # cur-local pixel row of this band's first row
        cbf = cur_ref[...].astype(jnp.bfloat16)
        nvv = sc_ref[0, 0]
        rr0 = sc_ref[0, 1]  # read offset of cur row 0 inside the plane band
        gpx = sc_ref[0, 2]  # global frame pixel row of cur row 0

        # tile-local block-col iotas + the tile's global block-col offset
        # (validity is evaluated in GLOBAL frame coordinates)
        col_sub = jax.lax.broadcasted_iota(jnp.int32, (1, nbc2_t), 1) + ctile * nbc2_t
        row_sub = jax.lax.broadcasted_iota(jnp.int32, (nbr2_b, 1), 0)
        col_f = jax.lax.broadcasted_iota(jnp.int32, (1, nbc_t), 1) + ctile * nbc_t
        row_f = jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)

        # 0/1 aggregation matrices: the blocked sums run on the MXU (Mosaic
        # cannot lower lane-splitting reshapes).  bf16 operands are exact
        # (integers <= 255 / 0-1) and Pallas lowers to the MXU with a true
        # f32 accumulator, exact for sums < 2^24.
        def agg(n_out, n_in, group):
            a = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 0) // group
            b = jax.lax.broadcasted_iota(jnp.int32, (n_in, n_out), 1)
            return (a == b).astype(jnp.float32)

        col_agg = agg(nbc2_t, w_t, sub_bs).astype(jnp.bfloat16)  # (w_t, nbc2_t)
        row_agg = agg(nbr2_b, band_px, sub_bs).T  # (nbr2_b, band_px)
        if row_first:
            row_agg = row_agg.astype(jnp.bfloat16)
        col_pair = agg(nbc_t, nbc2_t, 2)  # (nbc2_t, nbc_t)
        row_pair = agg(band, nbr2_b, 2).T  # (band, nbr2_b)

        def expander_rows(npx, nblk, group):
            # (npx, nblk) 0/1 with [p, b] = (p // group == b)
            a = jax.lax.broadcasted_iota(jnp.int32, (npx, nblk), 0) // group
            b = jax.lax.broadcasted_iota(jnp.int32, (npx, nblk), 1)
            return (a == b).astype(jnp.bfloat16)

        def expander_cols(nblk, npx, group):
            # (nblk, npx) 0/1 with [b, p] = (p // group == b) — built directly
            # in its matmul orientation (a runtime transpose materializes)
            a = jax.lax.broadcasted_iota(jnp.int32, (nblk, npx), 1) // group
            b = jax.lax.broadcasted_iota(jnp.int32, (nblk, npx), 0)
            return (a == b).astype(jnp.bfloat16)

        # block-mask -> pixel-mask expansion matrices (MXU; Mosaic cannot
        # reshape across lanes so the expansion must be matmuls)
        if want_pred:
            er_f = expander_rows(band_px, band, bs)
            ec_f = expander_cols(nbc_t, w_t, bs)
        if want_qpred:
            er_q = expander_rows(band_px, nbr2_b, sub_bs)
            ec_q = expander_cols(nbc2_t, w_t, sub_bs)

        def expand_mask(m, er, ec):
            """(R, C) bf16 0/1 block mask -> (band_px, w) f32 pixel mask
            (Mosaic requires 32-bit matmul accumulators)."""
            t = jnp.dot(er, m, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return jnp.dot(t, ec, preferred_element_type=jnp.float32)

        best = {
            "sad": jnp.full((band, nbc_t), _INF32, jnp.int32),
            "sec": jnp.full((band, nbc_t), _INF32, jnp.int32),
            "qsad": jnp.full((nbr2_b, nbc2_t), _INF32, jnp.int32),
            "qsec": jnp.full((nbr2_b, nbc2_t), _INF32, jnp.int32),
        }
        if want_pred:
            best["predf"] = jnp.zeros((band_px, w_t), jnp.int16)
        if want_qpred:
            best["predq"] = jnp.zeros((band_px, w_t), jnp.int16)

        def one_ref(refi, best):
            ref_ok = refi < nvv

            def dma_for(kyi, slot):
                # row shift at DMA time, from the (k mod 8) pre-shifted plane
                # so the start row is provably 8-aligned (read_row0 must be
                # a multiple of 8)
                kk = jax.lax.rem(kyi, 8)
                start8 = pl.multiple_of(rr0 + y0 + (kyi // 8) * 8, 8)
                if ncol == 1:
                    src = refs_hbm.at[refi, kk, pl.ds(start8, band_px), :]
                else:
                    # w_t is 128-aligned by _col_tiles, so the lane start is
                    # provably tile-aligned
                    c0 = pl.multiple_of(ctile * w_t, 128)
                    src = refs_hbm.at[refi, kk, pl.ds(start8, band_px), pl.ds(c0, wtp)]
                return pltpu.make_async_copy(src, band_vmem.at[slot], dma_sem.at[slot])

            # double-buffered dy bands: dy+1's copy is in flight while dy's
            # 17-candidate compute runs.  No conditionals (Mosaic conditional
            # -DMA pathologies): the last iteration redundantly re-starts
            # dy=nd_y-1 into the other slot and the per-ref epilogue waits it.
            dma_for(0, 0).start()

            def one_dy(kyi, best):
                dy = dyv_ref[kyi]  # original-grid displacement (traced)
                dyi = dyiv_ref[kyi]  # grid index for the secondary key
                absdy = jnp.where(dy < 0, -dy, dy)
                dy_ok = absdy <= grid_sr  # odd plane's extra k is no candidate
                slot = jax.lax.rem(kyi, 2)
                dma_for(jnp.minimum(kyi + 1, nd_y - 1), jax.lax.rem(kyi + 1, 2)).start()
                dma_for(kyi, slot).wait()
                rows = band_vmem[slot]
                bsad, bsec, qsad, qsec = best["sad"], best["sec"], best["qsad"], best["qsec"]
                bpredf = best.get("predf")
                bpredq = best.get("predq")
                hi = jax.lax.Precision.HIGHEST
                for kxi in range(nd_x):
                    dx = dx_list[kxi]  # static original-grid displacement
                    dxi = dxi_list[kxi]
                    win = rows[:, kxi : kxi + w_t]
                    # the whole diff stage runs in bf16 (Mosaic has no vector
                    # integer abs): pixels are ints <= 255 and every int in
                    # [-255, 255] is exact in bf16 (8 significand bits), so
                    # convert/sub/abs are all exact — and one f32 pass
                    # cheaper per candidate than the old int16->f32->bf16
                    diff = jnp.abs(win.astype(jnp.bfloat16) - cbf)
                    if row_first:
                        # sub-block ROW sums first: integers <= sub_bs*255,
                        # exact in the f32 accumulator.  The column matmul
                        # needs bf16 operands, so split each sum exactly into
                        # hi*256 + lo (hi <= sub_bs, lo <= 255 — both exact
                        # in bf16), aggregate both halves in ONE stacked
                        # matmul, and recombine in f32 (<= 2^16, exact).
                        ssr = jnp.dot(row_agg, diff, preferred_element_type=jnp.float32)
                        ssr_i = ssr.astype(jnp.int32)
                        hl = jnp.concatenate([ssr_i >> 8, ssr_i & 255], axis=0).astype(jnp.bfloat16)
                        a2 = jnp.dot(hl, col_agg, preferred_element_type=jnp.float32)
                        ss_f = a2[:nbr2_b] * 256.0 + a2[nbr2_b:]
                    else:
                        t = jnp.dot(diff, col_agg, preferred_element_type=jnp.float32)  # (band_px, nbc2)
                        ss_f = jnp.dot(row_agg, t, preferred_element_type=jnp.float32, precision=hi)
                    fs_f = jnp.dot(row_pair, jnp.dot(ss_f, col_pair, preferred_element_type=jnp.float32, precision=hi),
                                   preferred_element_type=jnp.float32, precision=hi)  # (band, nbc)
                    ss = ss_f.astype(jnp.int32)
                    fs = fs_f.astype(jnp.int32)
                    l1 = (abs(dx) + absdy).astype(jnp.int32)
                    sec = (((l1 << 3) << 8 | dxi) << 8 | dyi) | jnp.int32(refi << 16)
                    # validity in GLOBAL ref-grid coords (strict reference
                    # bounds; +2n FME bound when fme)
                    px_q = (col_sub * sub_bs) * scale + dx
                    py_q = (row_sub * sub_bs + y0 + gpx) * scale + dy
                    vq = (px_q >= 0) & (px_q < Wg - sub_bs) & (py_q >= 0) & (py_q < Hg - sub_bs)
                    if fme:
                        vq &= (px_q + 2 * sub_bs >= 0) & (px_q + 2 * sub_bs < Wg - sub_bs)
                        vq &= (py_q + 2 * sub_bs >= 0) & (py_q + 2 * sub_bs < Hg - sub_bs)
                    vq = vq & ref_ok & dy_ok
                    candq = jnp.where(vq, ss, _INF32)
                    upq = (candq < qsad) | ((candq == qsad) & (candq != _INF32) & (sec < qsec))
                    qsad = jnp.where(upq, candq, qsad)
                    qsec = jnp.where(upq, sec, qsec)
                    if want_qpred:
                        mq = expand_mask(upq.astype(jnp.bfloat16), er_q, ec_q)
                        bpredq = jnp.where(mq > 0.5, win, bpredq)
                    px_f = (col_f * bs) * scale + dx
                    py_f = (row_f * bs + y0 + gpx) * scale + dy
                    vf = (px_f >= 0) & (px_f < Wg - bs) & (py_f >= 0) & (py_f < Hg - bs)
                    if fme:
                        vf &= (px_f + 2 * bs >= 0) & (px_f + 2 * bs < Wg - bs)
                        vf &= (py_f + 2 * bs >= 0) & (py_f + 2 * bs < Hg - bs)
                    vf = vf & ref_ok & dy_ok
                    cand = jnp.where(vf, fs, _INF32)
                    up = (cand < bsad) | ((cand == bsad) & (cand != _INF32) & (sec < bsec))
                    bsad = jnp.where(up, cand, bsad)
                    bsec = jnp.where(up, sec, bsec)
                    if want_pred:
                        mf = expand_mask(up.astype(jnp.bfloat16), er_f, ec_f)
                        bpredf = jnp.where(mf > 0.5, win, bpredf)
                new = {"sad": bsad, "sec": bsec, "qsad": qsad, "qsec": qsec}
                if want_pred:
                    new["predf"] = bpredf
                if want_qpred:
                    new["predq"] = bpredq
                return new

            best = jax.lax.fori_loop(0, nd_y, one_dy, best)
            # drain the last redundant prefetch (starts == waits per ref)
            dma_for(nd_y - 1, nd_y % 2).wait()
            return best

        for refi in range(nref):  # static unroll: nref is small
            best = one_ref(refi, best)

        outs[0][0, 0] = best["sad"]
        outs[1][0, 0] = best["sec"]
        outs[2][0, 0] = best["qsad"]
        outs[3][0, 0] = best["qsec"]
        i = 4
        if want_pred:
            outs[i][0] = best["predf"]
            i += 1
        if want_qpred:
            outs[i][0] = best["predq"]

    # 4D blocks for the small outputs: Mosaic requires the trailing two BLOCK
    # dims be (8, 128)-divisible or equal to the array dims — a column tile's
    # (band, nbc_t) lane count is neither, so give each (row, col) program its
    # own leading cell and keep the trailing dims full
    out_specs = [
        pl.BlockSpec((1, 1, band, nbc_t), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, band, nbc_t), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nbr2_b, nbc2_t), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nbr2_b, nbc2_t), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nprog, ncol, band, nbc_t), jnp.int32),
        jax.ShapeDtypeStruct((nprog, ncol, band, nbc_t), jnp.int32),
        jax.ShapeDtypeStruct((nprog, ncol, nbr2_b, nbc2_t), jnp.int32),
        jax.ShapeDtypeStruct((nprog, ncol, nbr2_b, nbc2_t), jnp.int32),
    ]
    for flag in (want_pred, want_qpred):
        if flag:
            out_specs.append(pl.BlockSpec((1, band_px, w_t), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((nprog, band_px, w), jnp.int16))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nprog, ncol),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nd_y,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nd_y,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((band_px, w_t), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # shifted ref planes, HBM
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, band_px, wtp), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scalars, dyv, dyiv, cur.astype(jnp.int16), refs_shift)

    def untile(a, ncols, nrows):
        # (nprog, ncol, rows, cols_t) -> (nprog*rows, ncol*cols_t) raster,
        # sliced back to the unpadded block-row count
        return a.transpose(0, 2, 1, 3).reshape(a.shape[0] * a.shape[2], ncols)[:nrows]

    out = [
        untile(res[0], nbc, nbr), untile(res[1], nbc, nbr),
        untile(res[2], nbc2, nbr2), untile(res[3], nbc2, nbr2),
    ]
    for r in res[4:]:
        out.append(r.reshape(nprog * band_px, w)[:h])
    return tuple(out)


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


def _winner_select(sad, sec, best_sad, best_sec, preds, nbr, nbc, bs):
    """Pixel prediction of the lexicographic winner plane.  The block-level
    winner mask expands to pixels by broadcast+reshape (pure XLA layout ops,
    no gather)."""
    if len(preds) == 1:
        return preds[0]
    h, w = preds[0].shape
    out = preds[0]
    for p in range(1, len(preds)):
        m = (sad[p] == best_sad) & (sec[p] == best_sec) & (best_sad != _INF32)
        mpx = jnp.broadcast_to(m[:, None, :, None], (nbr, bs, nbc, bs)).reshape(h, w)
        out = jnp.where(mpx, preds[p], out)
    return out


def _assemble(planes, grid_sr: int, vbs: bool, nbr: int, nbc: int, bs: int, sub_bs: int,
              want_pred: bool):
    """Lexicographic (sad, sec) combine of plane results + unpack."""
    sad = jnp.stack([p[0] for p in planes])
    sec = jnp.stack([p[1] for p in planes])
    best_sad = sad.min(axis=0)
    sec_m = jnp.where((sad == best_sad[None]) & (sad != _INF32), sec, _INF32)
    best_sec = sec_m.min(axis=0)
    mv, sadv, ok = _unpack(best_sad.reshape(-1), best_sec.reshape(-1), grid_sr)
    out = {"mv": mv, "sad": sadv, "ok": ok}
    if want_pred:
        out["pred"] = _winner_select(
            sad, sec, best_sad, best_sec, [p[4] for p in planes], nbr, nbc, bs
        ).astype(jnp.int32)
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
        if want_pred:
            nbr2, nbc2 = 2 * nbr, 2 * nbc
            out["pred_quads"] = _winner_select(
                qsad, qsec, bq, bqs, [p[5] for p in planes], nbr2, nbc2, sub_bs
            ).astype(jnp.int32)
    return out


@functools.partial(jax.jit, static_argnames=("sr", "bs", "sub_bs", "vbs", "interpret",
                                             "grid_dims", "want_pred"))
def full_search_pallas(cur, refs, sr: int, bs: int, sub_bs: int, vbs: bool,
                       nvalid=None, interpret: bool = False,
                       read_row0=0, g_px0=0, grid_dims=None, want_pred: bool = True):
    """Whole-pel full search over ``refs`` (nref, bandh, W); same contract and
    bit-identical results as core/me.py full_search_materialized, plus
    ``pred`` / ``pred_quads`` pixel bands when ``want_pred`` (blocks with
    ok=False hold zeros — callers apply the mv=(0,0,0) fallback).

    ``refs`` may be a halo band taller than cur: ``read_row0`` is cur row 0's
    row within the band (must be a multiple of 8), ``g_px0`` its global frame
    row, and ``grid_dims`` the full frame (H, W) for validity.
    """
    h, w = cur.shape
    assert refs.shape[-1] == w
    if grid_dims is None:
        grid_dims = (refs.shape[-2], w)
    d = list(range(-sr, sr + 1))
    plane = _plane_search(
        cur, refs, sr, bs, sub_bs, 1, False, grid_dims, sr,
        d, [x + sr for x in d], d, [y + sr for y in d], nvalid, interpret,
        read_row0=read_row0, g_px0=g_px0, want_pred=want_pred, want_qpred=want_pred and vbs,
    )
    return _assemble([plane], sr, vbs, h // bs, w // bs, bs, sub_bs, want_pred)


@functools.partial(jax.jit, static_argnames=("sr", "bs", "sub_bs", "vbs", "interpret",
                                             "grid_dims", "want_pred", "wrap_row_pass"))
def full_search_pallas_fme(cur, refs, sr: int, bs: int, sub_bs: int, vbs: bool,
                           nvalid=None, interpret: bool = False,
                           read_row0=0, g_px0=0, grid_dims=None, want_pred: bool = True,
                           wrap_row_pass: bool = True):
    """Half-pel full search over ORIGINAL refs (nref, bandh, W) — the parity
    planes of the half-pel grid are computed directly from the pixels
    (core/me.fme_parity_planes), never materializing the 2x upsample.

    ``sr`` is the config search range; the candidate grid is +-2*sr in
    half-pel units (the reference doubles the range under FME,
    Encoder.py:1649).  Each of the 4 parity planes is searched by the
    whole-pel kernel with its own static dx list / dy tables; plane winners
    combine lexicographically — bit-identical to the XLA FME search.
    ``wrap_row_pass`` is quirk K17 (uint8 row sums wrap modulo 256; False
    only for the synthetic all-128 initial reference).

    Band support as in full_search_pallas; ``grid_dims`` is the full
    UPSAMPLED grid (2H-1, 2W-1) and defaults to treating ``refs`` as whole
    frames.
    """
    h, w = cur.shape
    assert refs.shape[-1] == w
    if grid_dims is None:
        grid_dims = (2 * refs.shape[-2] - 1, 2 * w - 1)
    planes4 = jax.vmap(lambda r: M.fme_parity_planes(r, jnp, wrap_row_pass=wrap_row_pass))(refs)
    D = sr
    grid_sr = 2 * sr
    planes = []
    for pi, (py, px) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        plane = planes4[:, pi]
        ks = list(range(-D, D + 1))
        dx_all = [2 * k + px for k in ks]
        keep = [i for i, dxv in enumerate(dx_all) if abs(dxv) <= grid_sr]
        dx_list = [dx_all[i] for i in keep]
        dxi_list = [dx_all[i] + grid_sr for i in keep]
        dy_vals = [2 * k + py for k in ks]  # odd plane's k=D masked in-kernel
        dyi_vals = [min(v + grid_sr, 2 * grid_sr) for v in dy_vals]
        planes.append(
            _plane_search(
                cur, plane, D, bs, sub_bs, 2, True, grid_dims, grid_sr,
                dx_list, dxi_list, dy_vals, dyi_vals, nvalid, interpret,
                read_row0=read_row0, g_px0=g_px0,
                want_pred=want_pred, want_qpred=want_pred and vbs,
            )
        )
    return _assemble(planes, grid_sr, vbs, h // bs, w // bs, bs, sub_bs, want_pred)



# ----------------------------------------------------------- pred fetch
# MV code packing: 13 bits per displacement component so fast-ME MVP chains
# (unbounded walks, Encoder.py:719-742 — |d| can reach frame size) pack into
# the same int32 equality codes as full-search winners.  ref < 32 keeps the
# code non-negative, so the -1/-2 sentinels can never collide.
_MV_OFF = 4096  # |d| <= 4095 covers every frame dimension the codec supports

# build_fetch_table_jax: max (bands x grid x codes) compare-work product for
# the bitmap dedup; beyond it the sort-based jnp.unique takes over
_BITMAP_WORK_CAP = 1_000_000_000


def mv_codes(mv3, nbr, nbc):
    """(nb, 3) MVs -> (nbr, nbc) packed codes (ref<<26)|((dx+4096)<<13)|(dy+4096)."""
    c = (mv3[:, 2] << 26) | ((mv3[:, 0] + _MV_OFF) << 13) | (mv3[:, 1] + _MV_OFF)
    return c.reshape(nbr, nbc)


def sub_mv_codes(sub_mv, nbr, nbc):
    """(nb, 4, 3) quad-order sub MVs -> (2nbr, 2nbc) raster packed codes."""
    c = (sub_mv[:, :, 2] << 26) | ((sub_mv[:, :, 0] + _MV_OFF) << 13) | (sub_mv[:, :, 1] + _MV_OFF)
    return c.reshape(nbr, nbc, 2, 2).transpose(0, 2, 1, 3).reshape(2 * nbr, 2 * nbc)


def pallas_enabled(me_search: str) -> bool:
    """The single dispatch policy for every Pallas path (search kernels and
    the decode fetch, single-chip and mesh): explicit opt-in, or 'auto' on a
    real TPU backend (interpret mode is for tests, not production CPU)."""
    return me_search == "pallas" or (me_search == "auto" and jax.default_backend() == "tpu")


def fme_caseB_valid2(mv3, xs, ys, n, h, w):
    """The FME margin check (case B, Encoder.py:447) on the NATIVE path:
    margin = the block's own size n (the K18 fix — decode predicts exactly
    what the residual was computed against).  Blocks failing it take the
    all-128 fallback.  Shared by the single-chip and mesh decode-fetch
    steps so the mask can never drift from the dispatch predicate
    (fetch_decodable's valid1)."""
    H2, W2 = 2 * h - 1, 2 * w - 1
    px = 2 * xs + mv3[..., 0]
    py = 2 * ys + mv3[..., 1]
    return (
        (px + 2 * n >= 0) & (px + 2 * n < W2 - n)
        & (py + 2 * n >= 0) & (py + 2 * n < H2 - n)
    )


FETCH_BUCKETS = (64, 256, 512)


def fetch_decodable(mv_np, smv_np, sr: int, fme: bool, vbs: bool,
                    h: int, w: int, bs: int, sub_bs: int, nref: int | None = None,
                    pad: int | None = None) -> bool:
    """Host predicate: a frame's transmitted MVs fit pred_fetch_compact.

    Whole-pel needs only |d| <= sr (cases A and C both come out of the
    zero-padded plane); FME additionally needs every block case A-or-B
    (primary bounds valid in FRAME-global coordinates — case C reads a
    stride-1 window of the upsampled frame, which only the XLA gather path
    serves).  Well-formed full-search streams always pass; fast-ME MVP
    chains can exceed sr — pass ``pad`` (from wide_pad) to check against a
    WIDE plane padding instead (JaxCodec.decode dispatch).  |d| < _MV_OFF
    guards the code packing.
    """
    base = pad if pad is not None else sr
    bound = min(2 * base if fme else base, _MV_OFF - 1)
    allmv = np.concatenate([mv_np.reshape(-1, 3), smv_np.reshape(-1, 3)]) \
        if vbs else mv_np.reshape(-1, 3)
    if np.abs(allmv[:, :2]).max(initial=0) > bound:
        return False
    # corrupt streams: an out-of-range ref index would drive an out-of-
    # bounds DMA in the kernel (the XLA gather path clamps instead)
    if allmv[:, 2].min(initial=0) < 0 or (
        nref is not None and allmv[:, 2].max(initial=0) >= nref
    ):
        return False
    if not fme:
        return True
    nbr, nbc = h // bs, w // bs
    ys, xs = np.meshgrid(np.arange(nbr) * bs, np.arange(nbc) * bs, indexing="ij")
    bx, by = xs.reshape(-1), ys.reshape(-1)
    H2, W2 = 2 * h - 1, 2 * w - 1

    def valid1(mv3, xs_, ys_, n):
        px = 2 * xs_ + mv3[..., 0]
        py = 2 * ys_ + mv3[..., 1]
        return (px >= 0) & (px < W2 - n) & (py >= 0) & (py < H2 - n)

    ok = valid1(mv_np.reshape(-1, 3), bx, by, bs).all()
    if vbs:
        offs = np.array([[0, 0], [0, 1], [1, 0], [1, 1]]) * sub_bs
        qx = bx[:, None] + offs[None, :, 1]
        qy = by[:, None] + offs[None, :, 0]
        ok = ok and valid1(smv_np.reshape(-1, 4, 3), qx, qy, sub_bs).all()
    return bool(ok)


#: widest supported wide-mode plane pad (k-units).  Beyond this the padded
#: plane's HBM cost dwarfs the fetch win and the XLA gather path is better.
WIDE_PAD_MAX = 512


def wide_pad(mvs_np_list, sr: int, fme: bool):
    """Clip-wide WIDE-mode plane pad for fast-ME streams: the smallest
    32-multiple (bounding recompiles: pad is a static kernel argument)
    covering every transmitted displacement's plane offset, or the narrow
    sr-derived pad when that already covers them, or None when the stream
    needs more than WIDE_PAD_MAX (the XLA gather path serves it instead).

    ``mvs_np_list``: (N, 3) int arrays (full + sub MVs of every inter
    frame).  One pad for the whole clip so every frame's decode step shares
    a single compiled kernel."""
    base = sr + 1 if fme else sr
    need = 0
    for a in mvs_np_list:
        a = a.reshape(-1, 3).astype(np.int64)
        if a.size == 0:
            continue
        if np.abs(a[:, :2]).max(initial=0) >= _MV_OFF:
            return None
        d = a[:, :2]
        k = (d - d % 2) // 2 if fme else d
        need = max(need, int(np.abs(k).max(initial=0)))
    if need <= base:
        return base
    pad = -(-need // 32) * 32
    return pad if pad <= WIDE_PAD_MAX else None


def clip_wide_pad(mvs_np_list, sr: int, fme: bool):
    """The WIDE-mode dispatch policy, shared by the single-chip facade and
    the mesh decoder (one place, so the dispatchers cannot diverge): the
    clip's wide plane pad, or None when the narrow sr-derived pad already
    serves every transmitted displacement OR the stream exceeds
    WIDE_PAD_MAX (fetch_decodable(pad=None) then rejects the wide frames
    and they take the XLA gather path)."""
    base = sr + 1 if fme else sr
    wp = wide_pad(mvs_np_list, sr, fme)
    return wp if (wp is not None and wp != base) else None


def fetch_band_rows(nbr: int, w: int, bs: int, vbs: bool) -> int:
    """Block rows per pred_fetch_compact band program.  VMEM residency per
    band row-pixel: 2 int16 pred outputs + the int32 pixel-code maps (full,
    + quad under VBS) + the live int16 barrel-shift/compare temporaries,
    plus the double-buffered (2, band_px, Wk) int16 DMA scratch.  The
    per-pixel constant is MEASURED, not derived: Mosaic's scoped-vmem stack
    for the 7-level log barrel shifter keeps several band-wide int16 slice
    levels live, and the 4K VBS OOM point (band_px=176, w=3840, Wk=4096:
    20.12M scoped = 2.88M scratch + 26.95 B/px) pins it at ~27 B/px — the
    a-priori model (16 B/px) under-counted by the live slice levels.
    Budget 12.75M of the 16M scoped limit (margin for rounding + per-shape
    drift).  Shared with the table builders: tables are BANDED (one
    candidate list per band program, only the MVs whose blocks live in that
    band), so builder and kernel must agree on the banding."""
    per_px = 27
    wk_est = (-(-(w + 136) // 128) * 128) * 2 * 2
    return max(1, min(int(12.75 * 2**20) // (w * per_px + wk_est) // bs, 16, nbr))


def _fetch_rows_from_mvs(allmv, sr: int, fme: bool, row0: int, pads):
    """Shared per-candidate DMA-row arithmetic: (n, 3) distinct MVs ->
    (5, n) int32 rows (see build_fetch_table's row layout)."""
    dx, dy, rf = allmv[:, 0], allmv[:, 1], allmv[:, 2]
    base = sr + 1 if fme else sr
    padr, padc = (base, base) if pads is None else pads
    if fme:
        pyp, pxp = dy % 2, dx % 2
        ky, kx = (dy - pyp) // 2, (dx - pxp) // 2
        lead = rf * 4 + pyp * 2 + pxp
        t, c0 = ky + padr, kx + padc
    else:
        lead = rf
        t, c0 = dy + padr, dx + padc
    t = t + row0
    assert (t >= 0).all() and (c0 >= 0).all(), "MV outside the padded plane"
    code = (rf << 26) | ((dx + _MV_OFF) << 13) | (dy + _MV_OFF)
    kk = t % 8
    return np.stack([lead, kk, t - kk, c0, code]).astype(np.int32)


def build_fetch_table(mv_np, smv_np, sr: int, fme: bool, vbs: bool,
                      nbr: int, nbc: int, bs: int, row0: int = 0, pads=None):
    """HOST side of the decode prediction fetch: the distinct transmitted MVs
    of one frame -> a BANDED (nprog, 5, ncand_pad) int32 DMA table for
    pred_fetch_compact — band i's list holds only the MVs transmitted by
    blocks in band i's rows, so each band program DMAs only the windows its
    own blocks reference (the global table made every program fetch every
    candidate: nprog x the HBM traffic on spatially-coherent content).

    Decode is the inverse problem of search: the encoder must SWEEP every
    candidate, but the decoder is TOLD the winners — and the bitstream is host
    data, so the candidate set (typically tens of distinct MVs on coherent
    content) is known before the step is dispatched.  Each row describes one
    whole-pel window DMA in the (parity-)plane stack built by
    pred_fetch_compact:

      [0] plane-stack leading index (ref under whole-pel; ref*4 + parity
          plane (dy%2)*2 + (dx%2) under FME — a half-pel displacement d
          strides CONTIGUOUSLY through its parity plane as k = (d - d%2)/2)
      [1] row shift mod 8 (which of the 8 pre-shifted planes to read, so
          every DMA start stays sublane-aligned)
      [2] 8-aligned plane row offset (row shift - [1])
      [3] plane column offset (column shift + pad, >= 0)
      [4] the packed MV code (ref<<26)|((dx+4096)<<13)|(dy+4096) matched
          against the per-block code maps — -1 on padding slots (the
          kernel's per-band trip count stops before them)

    Returns (table, pad) or None when any band has more distinct MVs than
    the largest bucket (the XLA gather path is then the better program
    anyway).  ncand is padded up to a FETCH_BUCKETS size so recompiles are
    bounded by the bucket count, not the per-frame MV diversity.

    ``row0``: STATIC plane-row offset of the consumer's first block row
    inside the reference band, folded into [1]/[2] here because it need not
    be 8-aligned (row-tiled mesh decode passes its halo height; any traced
    8-aligned remainder rides pred_fetch_compact's ``read_row0``).

    ``pads``: optional (padr, padc) for the WIDE kernel mode (fast-ME
    streams, whose MVP-chain walks are not bounded by the search range —
    the plane is padded by padr rows / padc cols instead of the sr-derived
    pad, and the kernel resolves the column offset as a 128-aligned DMA
    lane start plus a <=127 barrel-shift remainder).  None = narrow mode,
    pad = sr(+1) on both axes exactly as before.
    """
    base = sr + 1 if fme else sr
    band = fetch_band_rows(nbr, nbc * bs, bs, vbs)
    nprog = -(-nbr // band)
    mv_g = np.asarray(mv_np).reshape(nbr, nbc, 3)
    smv_g = np.asarray(smv_np).reshape(nbr, nbc, 4, 3) if vbs else None
    per_band = []
    for i in range(nprog):
        rows = [mv_g[i * band : (i + 1) * band].reshape(-1, 3)]
        if vbs:
            rows.append(smv_g[i * band : (i + 1) * band].reshape(-1, 3))
        allmv = np.unique(np.concatenate(rows, axis=0), axis=0).astype(np.int64)
        if allmv.shape[0] > FETCH_BUCKETS[-1]:
            return None
        per_band.append(_fetch_rows_from_mvs(allmv, sr, fme, row0, pads))
    ncand = max(t.shape[1] for t in per_band)
    npad = next(b for b in FETCH_BUCKETS if ncand <= b)
    tab = np.zeros((nprog, 5, npad), np.int32)
    tab[:, 4, :] = -1
    for i, t in enumerate(per_band):
        tab[i, :, : t.shape[1]] = t
    pad_out = base if pads is None else pads
    return np.ascontiguousarray(tab), pad_out


def winner_bucket(nb: int, sr: int, fme: bool, vbs: bool, nref: int) -> int:
    """Static table width covering EVERY possible winner-code set of an
    encode search: distinct codes are bounded both by the number of coded
    (sub-)blocks and by the candidate-grid size.  Exactness of the bound is
    what lets the encode winner fetch run without an overflow fallback —
    crucial on the mesh, where the GOP vmap would lower a lax.cond to
    select-both-branches (measured 79 -> 23 fps when the XLA gather branch
    ran every frame alongside the fetch)."""
    d = 2 * sr if fme else sr
    grid = (2 * d + 1) ** 2 * nref
    blocks = (5 if vbs else 1) * nb
    return max(64, -(-min(grid, blocks) // 64) * 64)


def build_fetch_table_jax(mv, smv, sr: int, fme: bool, vbs: bool,
                          nbr: int, nbc: int, bs: int, nref: int, row0: int = 0):
    """DEVICE-side build_fetch_table: the ENCODE winner fetch (round-2
    VERDICT item 2) needs the DMA table for the argmin's own winner MVs
    without a host round trip (a host sync between search and the rest of
    the encode step would serialize the per-frame pipeline — ~30 ms/frame on
    tunneled links).  Same arithmetic as the host builder — BANDED like it
    (one jnp.unique per band over that band's block rows), vectorized over a
    STATIC per-band bucket.

    Encode winners always satisfy the kernel's bounds (search validity under
    FME is strictly tighter than case A, and |d| <= 2*sr <= 126 for any
    config's search range), and the per-band bucket is winner_bucket over
    the BAND's block count — the exact worst-case distinct-code bound — so
    the table can never overflow and no fallback path exists.  A wide bucket
    is cheap: the fetch kernel's per-band trip count is the REAL candidate
    count (jnp.sum(code != -1)), the width only sizes the SMEM table.
    Padding slots carry code -1 (matching the host builder's); a sentinel
    keeps the last (row-padded) band's real candidates contiguous from slot
    0 (jnp.unique sorts ascending and pads its TAIL with the fill)."""
    band = fetch_band_rows(nbr, nbc * bs, bs, vbs)
    nprog = -(-nbr // band)
    row_pad = nprog * band - nbr
    bucket = winner_bucket(band * nbc, sr, fme, vbs, nref)
    _SENT = jnp.int32(2**31 - 1)  # sorts after every real code
    cf = mv_codes(mv.reshape(-1, 3), nbr, nbc)
    rows = [jnp.pad(cf, ((0, row_pad), (0, 0)), constant_values=_SENT)
            .reshape(nprog, band * nbc)]
    if vbs:
        cq = sub_mv_codes(smv.reshape(-1, 4, 3), nbr, nbc)
        rows.append(jnp.pad(cq, ((0, 2 * row_pad), (0, 0)), constant_values=_SENT)
                    .reshape(nprog, 4 * band * nbc))
    codes_b = jnp.concatenate(rows, axis=1)  # (nprog, per-band codes)
    # Distinct codes per band, ascending.  jnp.unique lowers to an XLA sort
    # (bitonic on TPU — measured ~30 ms at 4K where it dominated the winner
    # fetch); encode winners live on a SMALL static grid (|d| <= 2sr under
    # FME, ref < nref), so a presence bitmap over the grid + cumsum
    # compaction is pure vectorized compares.  grid codes ascend with grid
    # index (rf, dx, dy are non-overlapping bit fields), so the result is
    # bit-identical to the sorted unique.  The compare matrix is
    # (nprog, G, codes); fall back to unique when that work product is
    # large (big sr x nref grids).
    d = (2 * sr if fme else sr)
    span = 2 * d + 1
    G = nref * span * span
    if nprog * G * codes_b.shape[1] <= _BITMAP_WORK_CAP:
        rfg, dxg, dyg = jnp.meshgrid(jnp.arange(nref), jnp.arange(span) - d,
                                     jnp.arange(span) - d, indexing="ij")
        grid_codes = ((rfg.ravel() << 26) | ((dxg.ravel() + _MV_OFF) << 13)
                      | (dyg.ravel() + _MV_OFF)).astype(jnp.int32)
        pres = jnp.any(codes_b[:, None, :] == grid_codes[None, :, None], axis=2)
        cum = jnp.cumsum(pres.astype(jnp.int32), axis=1)  # 1-based counts
        npres = cum[:, -1]
        slots = jnp.arange(bucket, dtype=jnp.int32)
        idx = jnp.sum(cum[:, :, None] <= slots[None, None, :], axis=1)
        u = jnp.where(slots[None, :] < npres[:, None],
                      grid_codes[jnp.minimum(idx, G - 1)], -1)
    else:
        u = jax.vmap(lambda c: jnp.unique(c, size=bucket, fill_value=_SENT))(codes_b)
        u = jnp.where(u == _SENT, -1, u)
    valid = u >= 0
    rf = u >> 26
    dx = ((u >> 13) & 0x1FFF) - _MV_OFF
    dy = (u & 0x1FFF) - _MV_OFF
    if fme:
        pad = sr + 1
        pyp, pxp = dy % 2, dx % 2
        lead = rf * 4 + pyp * 2 + pxp
        t = (dy - pyp) // 2 + pad
        c0 = (dx - pxp) // 2 + pad
    else:
        pad = sr
        lead = rf
        t = dy + pad
        c0 = dx + pad
    t = t + row0
    zero = jnp.zeros_like(u)
    lead = jnp.where(valid, lead, zero)
    t = jnp.where(valid, t, zero)
    c0 = jnp.where(valid, c0, zero)
    kk = t % 8
    tab = jnp.stack([lead, kk, t - kk, c0, u], axis=1).astype(jnp.int32)
    return tab  # (nprog, 5, bucket)


@functools.partial(jax.jit, static_argnames=("pad", "bs", "sub_bs", "vbs", "fme",
                                             "interpret", "wrap_row_pass"))
def pred_fetch_compact(mv, sub_mv, refs, table, pad: int, bs: int, sub_bs: int,
                       vbs: bool, fme: bool, interpret: bool = False,
                       wrap_row_pass: bool = True, read_row0=0):
    """Decode-side prediction fetch: one banded DMA per DISTINCT transmitted
    MV instead of one XLA element-gather per pixel (the decode hot spot:
    ~11 ms/frame at 720p VBS+FME, ~0.34 GB/s effective).

    mv (nb, 3) / sub_mv (nb, 4, 3): transmitted MVs; refs (nref, h, w) RAW
    reconstructions; table/pad from build_fetch_table on the same MVs.  For
    each candidate the kernel DMAs its (band, w) window rows from the padded
    (parity-)plane stack, barrel-shifts the sub-128 lane remainder (7
    conditional static slices), and keeps the window wherever the PIXEL-
    resolution code map equals the candidate's code — the maps are expanded
    outside the kernel by XLA broadcast-repeats, so the per-candidate cost
    is one integer compare per pixel (the earlier block->pixel expand_mask
    ran two MXU matmuls per candidate, ~w/16 + w/8 MACs per pixel — the
    kernel's dominant cost once candidate counts grew).  Under FME the
    parity planes come straight from the raw refs (core/me.fme_parity_planes)
    — the (2H-1, 2W-1) upsample is never built.

    Returns (pred_full (h, w), pred_quads (h, w)) int16 pixel planes holding
    each (sub-)block's window at its own position.  Exact for case-A blocks
    and, whole-pel, case-C too (the plane padding IS the reference's
    zero-fill, Encoder.py:750-768); the FME case-B margin fallback
    (Encoder.py:447) is the caller's block-level mask.  Dispatch only frames
    that pass JaxCodec._pallas_decodable.

    Row-tiled mesh bands: ``refs`` may be TALLER than the mv grid (halo
    rows); the consumer's first block row sits at plane row (table's static
    ``row0``) + ``read_row0`` (traced, must be a multiple of 8 — the mesh's
    tile origins are block-aligned).  The band's parity planes equal slices
    of the frame's parity planes because the band origin is whole-pel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nref, bandh, w = refs.shape
    nbc = w // bs
    nbr = mv.shape[0] // nbc
    h = nbr * bs
    nbr2, nbc2 = 2 * nbr, 2 * nbc
    codes_f = mv_codes(mv, nbr, nbc)
    codes_q = sub_mv_codes(sub_mv, nbr, nbc) if vbs else jnp.full((nbr2, nbc2), -2, jnp.int32)
    if fme:
        planes = jax.vmap(lambda r: M.fme_parity_planes(r, jnp, wrap_row_pass=wrap_row_pass))(refs)
        planes = planes.reshape(nref * 4, bandh, w)
    else:
        planes = refs.astype(jnp.int32)
    ncand = table.shape[-1]
    band = fetch_band_rows(nbr, w, bs, vbs)
    band_px = band * bs
    assert table.shape[0] == -(-nbr // band), (
        "banded fetch table was built for a different banding "
        f"({table.shape[0]} bands vs {-(-nbr // band)})"
    )
    # VMEM-sized band, not a divisor of nbr (VERDICT r3 item 3): pad the
    # code maps with -2 (matches no table code, not even the -1 bucket
    # padding) and the planes with blank rows; outputs sliced back below
    nprog = -(-nbr // band)
    row_pad = nprog * band - nbr
    if row_pad:
        codes_f = jnp.concatenate(
            [codes_f, jnp.full((row_pad, nbc), -2, jnp.int32)], axis=0)
        codes_q = jnp.concatenate(
            [codes_q, jnp.full((2 * row_pad, nbc2), -2, jnp.int32)], axis=0)
    nbr2_b = band_px // sub_bs
    # pixel-resolution code maps (one XLA broadcast-repeat per frame): the
    # kernel compares these against each candidate's code directly — exact,
    # and removes the per-candidate expand_mask matmuls (2 MXU passes per
    # candidate, ~w/16 + w/8 MACs/px) that used to dominate at large nc
    pix_f = jnp.repeat(jnp.repeat(codes_f, bs, axis=0), bs, axis=1)
    pix_q = jnp.repeat(jnp.repeat(codes_q, sub_bs, axis=0), sub_bs, axis=1) \
        if vbs else jnp.full((nprog * band_px, w), -2, jnp.int32)

    # the per-candidate column offset c0 in [0, 2*pad] is resolved as a
    # 128-aligned dynamic DMA lane start (c0 // 128 * 128) plus a <=127
    # remainder barrel-shifted by a two-level static-slice select — so the
    # DMA window is Wk lanes wide regardless of pad, and the select count
    # is min(15, 2*pad//8) + 7 regardless of search range (round-2 ADVICE:
    # the flat chain was linear in sr; and WIDE pads — fast-ME streams whose
    # MVP chains exceed sr — would have made it unbounded)
    Wk = -(-(w + 136) // 128) * 128  # 127 (max rem) + 8 (level-1 headroom)
    Wp = 128 * ((2 * pad) // 128) + Wk  # covers the largest lane start
    planes_p = jnp.pad(planes.astype(jnp.int16),
                       ((0, 0), (pad, pad + 8 + row_pad * bs), (pad, Wp - w - pad)))
    Hp = bandh + 2 * pad + row_pad * bs
    shift = jnp.stack([planes_p[:, k : k + Hp, :] for k in range(8)], axis=1)
    pf3 = pix_f.reshape(nprog, band_px, w)
    pq3 = pix_q.reshape(nprog, band_px, w)
    # [0] = read_row0; [1 + i] = band i's REAL candidate count (its trip count)
    scalars = jnp.concatenate([
        jnp.asarray(read_row0, jnp.int32).reshape(1),
        jnp.sum(table[:, 4, :] != -1, axis=1).astype(jnp.int32),
    ])

    def kernel(nc_ref, tab3_ref, pf_ref, pq_ref, planes_hbm, predf_ref, predq_ref, band_vmem, dma_sem):
        prog = pl.program_id(0)
        rr0 = nc_ref[0]  # traced band-row origin (8-aligned by contract)
        tab = lambda r, ci: tab3_ref[0, r, ci]  # noqa: E731 — this band's rows
        y0 = prog * band_px
        pixf = pf_ref[0]
        pixq = pq_ref[0]

        predf_ref[0] = jnp.zeros((band_px, w), jnp.int16)
        predq_ref[0] = jnp.zeros((band_px, w), jnp.int16)
        nc = nc_ref[1 + prog]

        def dma_for(ci, slot):
            lead = tab(0, ci)
            kk = tab(1, ci)
            start8 = pl.multiple_of(y0 + tab(2, ci) + rr0, 8)
            lane0 = pl.multiple_of((tab(3, ci) // 128) * 128, 128)
            return pltpu.make_async_copy(
                planes_hbm.at[lead, kk, pl.ds(start8, band_px), pl.ds(lane0, Wk)],
                band_vmem.at[slot], dma_sem.at[slot],
            )

        # double-buffered candidate windows: start candidate ci+1's copy
        # before waiting on ci's, so the (cheap) compare work and every DMA's
        # latency overlap the next transfer.  No conditionals (the Mosaic
        # conditional-DMA pathologies in docs/TPU_DESIGN.md): the last body
        # iteration redundantly re-starts candidate nc-1 into the other slot
        # and the epilogue waits it — starts and waits stay balanced for any
        # nc >= 1 (every dispatched frame has at least one transmitted MV).
        dma_for(0, 0).start()

        def body(ci, carry):
            slot = jax.lax.rem(ci, 2)
            nxt = jnp.minimum(ci + 1, nc - 1)
            dma_for(nxt, jax.lax.rem(ci + 1, 2)).start()
            c0 = tab(3, ci)
            cand = tab(4, ci)
            dma_for(ci, slot).wait()
            # column shift: DMA lane starts/shapes must be 128-aligned and
            # dynamic_rotate is 32-bit-only and per-tile — the 128-aligned
            # part of c0 rode the DMA above, and the <=127 remainder is a
            # LOG barrel shifter: 7 conditional static-offset lane slices
            # (the same slice form the search kernel streams), constant for
            # ANY pad (round-2 ADVICE: the flat chain was 2*pad selects —
            # linear in search range; WIDE pads — fast-ME streams whose MVP
            # chains exceed sr — would have made it unbounded)
            rem = c0 % 128
            cur = band_vmem[slot]
            wleft = w + 127
            for k in (64, 32, 16, 8, 4, 2, 1):
                nxt = wleft - k
                cur = jnp.where((rem & k) != 0, cur[:, k : k + nxt], cur[:, :nxt])
                wleft = nxt
            win = cur  # (band_px, w)
            # keep-mask: ONE integer compare against the pixel-resolution
            # code map (each block has exactly one code, so candidate order
            # cannot matter)
            predf_ref[0] = jnp.where(pixf == cand, win, predf_ref[0])
            if vbs:
                predq_ref[0] = jnp.where(pixq == cand, win, predq_ref[0])
            return carry

        # trip count is the REAL candidate count (the table is padded up to
        # a bucket size only to bound recompiles)
        jax.lax.fori_loop(0, nc, body, jnp.int32(0))
        # the last body iteration re-started candidate nc-1 into slot nc%2;
        # drain it so every started DMA is waited before the program ends
        # (nc==0 cannot happen for a dispatched frame, but the max keeps the
        # SMEM index in bounds and the prologue/epilogue pair balanced even
        # then: prologue started slot 0, epilogue waits slot 0)
        dma_for(jnp.maximum(nc - 1, 0), jax.lax.rem(nc, 2)).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((1 + nprog,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 5, ncand), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, band_px, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band_px, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, band_px, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band_px, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, band_px, Wk), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    predf, predq = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nprog, band_px, w), jnp.int16),
            jax.ShapeDtypeStruct((nprog, band_px, w), jnp.int16),
        ],
        interpret=interpret,
    )(scalars, table, pf3, pq3, shift)
    return (predf.reshape(nprog * band_px, w)[:h],
            predq.reshape(nprog * band_px, w)[:h])


# ----------------------------------------------------- fast-ME window fetch
#: DMA pipeline depth of window_fetch.  The round-3 kernel double-buffered
#: (2 slots) and measured ~1.1 us/block — per-block compute is ~0.1 us, so
#: nearly all of it was un-hidden HBM round-trip latency.  8 slots keep 8
#: copies in flight; the floor drops to max(issue rate, bandwidth).
_FETCH_SLOTS = 8


def window_prep(planes, nwin: int, nwin_c: int | None = None):
    """Pad + cast the fast-ME candidate planes ONCE per frame for
    window_fetch: (P, H, W) integer-valued planes -> (P, Hp, Wp) int16 with

    * ``nwin`` zero rows on top and DMA headroom below, so every CLAMPED
      window origin (clip(by0, -nwin, H) + nwin) is a legal 8-aligned-start
      32-row fetch — clamping is exact because any origin outside
      (-nwin, H) has no overlap with the plane and reads all zeros either
      way (the reference's out-of-frame semantics);
    * 128 zero lanes on the left and a 256-lane fetch window's worth on the
      right, so the column offset rides the DMA as a 128-aligned lane start
      with the <=127 remainder barrel-shifted inside the kernel (the same
      split as pred_fetch_compact).

    ``nwin_c`` widens the column span for the lookahead chain step's
    RECTANGULAR wide windows (round-5: the per-block DMA serves them too —
    the (32, 256) fetch geometry already covers every production wide shape:
    FME k=4 reads 21x69, whole-pel 24x72).  Row extent <= 24 keeps
    rows+remainder inside the 32-row DMA; column extent <= 128 keeps the
    window inside the left lane pad and the post-barrel 129-lane slice.

    The prep is MV-independent: build it once per (frame, reference-stack)
    and reuse it across every chain-sweep step and the confirm fetch; fetch
    calls may use ANY row extent <= the prep's ``nwin`` (the top pad), so one
    wide-window prep also serves square confirm reads.
    Returns (planes_pad, H, W, pad_r).
    """
    P, H, W = planes.shape
    wc = nwin if nwin_c is None else nwin_c
    assert nwin <= 24, f"window_fetch supports row extents <= 24, got {nwin}"
    assert wc <= 128, f"window_fetch supports column extents <= 128, got {wc}"
    hp = ((H + nwin) // 8) * 8 + 32
    wp = ((W + 128) // 128) * 128 + 256
    planes_pad = jnp.pad(
        planes.astype(jnp.int16),
        ((0, 0), (nwin, hp - H - nwin), (128, wp - W - 128)),
    )
    return planes_pad, H, W, nwin


def window_fetch(prep, by0, bx0, nwin: int, interpret: bool = False,
                 nwin_c: int | None = None):
    """windows[b, p, i, j] = planes[p, by0[b]+i, bx0[b]+j], 0 out of plane —
    the fast-ME window gather (core/fastme.window_gather contract) as one
    small banded DMA per block instead of a full-plane one-hot contraction
    or a clamped dynamic_slice gather (~2.1 us/block of slice-gather latency
    at XLA level — the recorded 4K fast-ME floor, ROUND4.md cost model).

    Each block costs one (P, 32, 256) int16 DMA from the padded plane stack
    (window_prep) plus a 3-select sublane barrel (row remainder vs the
    8-aligned DMA start) and a 7-select lane barrel (column remainder vs the
    128-aligned lane start) — the log-select trick from pred_fetch_compact,
    constant in the MV magnitude (fast-ME MVP chains are unbounded).  The
    round-5 edition pipelines _FETCH_SLOTS copies deep with STATICALLY
    unrolled slot indices (the fori_loop body handles _FETCH_SLOTS blocks
    per trip), so the per-block slot select is a direct buf[s] read instead
    of a where-chain over all slots, and HBM latency overlaps across 8
    outstanding copies instead of 1.

    ``nwin_c`` serves the lookahead chain step's rectangular wide windows
    (rows=nwin <= 24, cols=nwin_c <= 128 — every production lookahead shape;
    see window_prep).  Returns (nb, P, nwin, nwin_c) int32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes_pad, H, W, pad_r = prep
    wc = nwin if nwin_c is None else nwin_c
    assert nwin <= pad_r, f"fetch row extent {nwin} exceeds the prep's pad {pad_r}"
    P = planes_pad.shape[0]
    nb = by0.shape[0]
    # padded plane row r holds plane row r - pad_r; clamping is exact because
    # any origin outside (-nwin, H) reads entirely inside the zero pads
    rows = jnp.clip(by0, -nwin, H) + pad_r         # [pad_r - nwin, H + pad_r]
    cols = jnp.clip(bx0, -wc, W) + 128             # [128 - wc, W + 128]
    rout = -(-nwin // 8) * 8                       # <= 24 (asserted in prep)
    ns = _FETCH_SLOTS
    nbpp = max(ns, (256 // P) // ns * ns)          # out block <= ~1.6 MB VMEM
    nprog = -(-nb // nbpp)
    npad = nprog * nbpp - nb
    if npad:
        rows = jnp.concatenate([rows, jnp.zeros((npad,), jnp.int32)])
        cols = jnp.concatenate([cols, jnp.zeros((npad,), jnp.int32)])

    def kernel(rows_ref, cols_ref, planes_hbm, out_ref, buf, sem):
        # the scalar vectors ride SMEM unblocked (Mosaic constrains blocked
        # SMEM shapes); each program walks its own nbpp-slice
        base = pl.program_id(0) * nbpp

        def dma_for(i, slot):
            s8 = pl.multiple_of((rows_ref[base + i] // 8) * 8, 8)
            l0 = pl.multiple_of((cols_ref[base + i] // 128) * 128, 128)
            return pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(s8, 32), pl.ds(l0, 256)],
                buf.at[slot], sem.at[slot],
            )

        # ns-deep pipelined per-block DMAs, the pred_fetch_compact
        # discipline: no conditional starts/waits (a DMA inside a conditional
        # wedges the Mosaic compile service, docs/TPU_DESIGN.md) — tail
        # iterations redundantly re-start the last block and the
        # unconditional epilogue drains every slot, so starts == waits.
        for s in range(ns):  # static prologue: fill the pipeline
            dma_for(jnp.minimum(s, nbpp - 1), s).start()

        def body(it, carry):
            i0 = it * ns
            for s in range(ns):  # static unroll: slot indices stay static
                i = i0 + s
                dma_for(i, s).wait()
                cur = buf[s]  # (P, 32, 256), static slot index
                remr = jax.lax.rem(rows_ref[base + i], 8)
                hleft = 32
                for k in (4, 2, 1):                # sublane barrel: 32->25
                    nh = hleft - k
                    cur = jnp.where((remr & k) != 0, cur[:, k : k + nh, :], cur[:, :nh, :])
                    hleft = nh
                # rows are resolved: drop to rout before the (7x wider) lane
                # barrel so its select traffic shrinks 25/rout-fold
                cur = jax.lax.slice(cur, (0, 0, 0), (P, rout, 256))
                remc = jax.lax.rem(cols_ref[base + i], 128)
                wleft = 256
                for k in (64, 32, 16, 8, 4, 2, 1):  # lane barrel: 256->129
                    nw = wleft - k
                    cur = jnp.where((remc & k) != 0, cur[:, :, k : k + nw], cur[:, :, :nw])
                    wleft = nw
                # refill this slot with block i + ns (clamped re-start of the
                # last block on the tail — drained by the epilogue)
                dma_for(jnp.minimum(i + ns, nbpp - 1), s).start()
                # lax.slice, not cur[None, :, :rout, :128]: the mixed
                # None+slice getitem lowers to an unsupported >2D gather
                out_ref[pl.ds(i, 1)] = jax.lax.slice(cur, (0, 0, 0), (P, rout, 128))[None]
            return carry

        jax.lax.fori_loop(0, nbpp // ns, body, jnp.int32(0))
        for s in range(ns):  # drain the tail re-starts (starts == waits)
            dma_for(jnp.minimum(nbpp - 1, nbpp - ns + s), s).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((nprog * nbpp,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((nprog * nbpp,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nbpp, P, rout, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ns, P, 32, 256), jnp.int16),
            pltpu.SemaphoreType.DMA((ns,)),
        ],
    )
    win = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * nbpp, P, rout, 128), jnp.int16),
        interpret=interpret,
    )(rows, cols, planes_pad)
    return win[:nb, :, :nwin, :wc].astype(jnp.int32)


# ------------------------------------------------ whole-pass rowscan kernel
#
# Round-5: the fast-ME sweep pass as ONE pallas_call instead of an XLA scan
# of Lp fetch+eval steps.  Measured at 4K (benchmarks/winfetch_probe.py):
# the XLA pass is 22.0 ms of which ~12.6 ms is the vmapped-dynamic-slice
# window gather (~2.1 us x 135 windows x 60 steps — the gather is
# ROW-SCATTER bound: ~11k gathered window rows per step) and ~7.6 ms is
# scan-step overhead; per-step Pallas fetch calls lose outright (26 ms) on
# the XLA<->Pallas boundary.  In-kernel, the whole pass pays ONE boundary,
# no scan overhead, and the fetch is a per-segment DMA wave whose cost is
# HBM strips: with the FME parity planes LANE-INTERLEAVED
# (fastme.interleave_planes — all 4 parities adjacent on lanes) a segment's
# wide window is 32 strips instead of 128.
#
# The eval is fastme.eval_chain_flat — the bit-exact 2-D-max twin of
# eval_chain (tests/test_fastme.py pins flat==chain==sequential eval9), so
# kernel passes produce IDENTICAL MVs to the XLA scan passes.  Mosaic
# lowering constraints that shaped this code (each cost a failed remote
# compile): no jnp int getitem on traced values (lowers via dynamic_slice —
# use lax.slice/index_in_dim), no mixed None+int indexing (gathers), no
# broadcasting a per-segment (S,) vector over higher-rank tiles (keep every
# per-segment scalar (S, 1) from birth), no dynamic reads of scratch slots
# (barrel per segment in a STATIC unroll with SMEM scalar conditions).


def pass_prep(planes, wr: int, wc: int, fme: bool):
    """XLA-side once-per-frame prep for rowscan_pass: interleave (FME) and
    pad the candidate planes for aligned (32, LF)-lane DMA windows.

    FME: planes (4*nref, H, W) bf16 -> (nref, Hp, LWp) int16 interleaved
    (lane 4c+p, p = 2*qy+qx); fetch window 512 lanes (remainders are
    multiples of 4, barrel 64..4).  Whole-pel: (nref, H, W) -> padded
    (nref, Hp, Wp) int16; fetch window 256 lanes (barrel 64..1).
    Returns (planes_pad, H, W, wr, wc, fme)."""
    from streamoptima_tpu.core import fastme as FM

    P, H, W = planes.shape
    assert wr <= 24, f"rowscan_pass row extent {wr} exceeds the 32-row DMA budget"
    pi = planes.astype(jnp.int16)
    if fme:
        pi = FM.interleave_planes(pi, jnp)
        lanes, left = 4 * W, 512
        lf = 512
        assert 127 + 4 * wc <= lf, f"wide cols {wc} exceed the 512-lane FME fetch"
    else:
        lanes, left = W, 128
        lf = 256
        assert 127 + wc <= lf, f"wide cols {wc} exceed the 256-lane fetch"
    hp = ((H + wr) // 8) * 8 + 32
    wp = -(-(lanes + left) // 128) * 128 + lf
    pad = jnp.pad(pi, ((0, 0), (wr, hp - H - wr), (left, wp - lanes - left)))
    return pad, H, W, wr, wc, fme


def rowscan_pass(prep, curK, xs0, xsK, ys, cmK, seeds, n: int, kl: int, dims,
                 nvalid=None, interpret: bool = False):
    """One full sweep pass (all Lp column groups) in one kernel.

    prep: pass_prep output.  curK (Lp, kl, S, n, nc) int16 current blocks —
    nc = 4n with pixels replicated over parity lanes under FME (the
    eval_chain_flat layout), n whole-pel.  xs0 (Lp*S,) int32 = xsK[:, 0, :]
    flat (the scalar DMA-origin columns); xsK (Lp, kl, S) int32; ys (S,)
    int32; cmK (Lp, kl) int32 column masks; seeds (S, 3) int32.

    Grid = (Lp,); scratch carries the chain seeds across groups (TPU grid
    steps run sequentially on one core): each step copies the seed vector
    to SMEM (scalar domain), issues one DMA per segment for its wide
    window, barrel-aligns each segment's fetch in a static unroll (scalar
    conditions), resolves the kl columns with eval_chain_flat, and writes
    (mvs, windows) to the per-group output blocks.  Returns mK
    (Lp, kl, S, 3) int32 and the stacked windows wK (Lp, S, nref, wr, LW)
    int16 (LW = 4*wc FME-interleaved, wc whole-pel) for
    confirm_windows_from_stack."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from streamoptima_tpu.core import fastme as FM

    planes_pad, H, W, wr, wc, fme = prep
    nref = planes_pad.shape[0]
    Lp, _, S = xsK.shape
    nc = curK.shape[-1]
    LF = 512 if fme else 256
    LW = 4 * wc if fme else wc

    def kernel(xs0_s, ys_s, cm_s, nv_s, planes_hbm, curK_ref, xsK_ref, ys_ref,
               seeds_ref, mK_ref, wK_ref, seeds_v, buf, dsem, seeds_s, csem):
        gidx = pl.program_id(0)

        @pl.when(gidx == 0)
        def _():
            seeds_v[...] = seeds_ref[...]

        # seed vector -> SMEM for the scalar-domain DMA origins
        cp = pltpu.make_async_copy(seeds_v, seeds_s, csem)
        cp.start()
        cp.wait()

        def origin(s):
            gx = seeds_s[s, 0]
            gy = seeds_s[s, 1]
            yv = ys_s[s]
            xv = xs0_s[gidx * S + s]
            if fme:
                # jnp // is floor_divide — matches fastme._wide_base exactly
                by0 = yv + (gy - kl) // 2
                bx0 = xv + (gx - kl) // 2
            else:
                by0 = yv + gy - kl
                bx0 = xv + gx - kl
            r = jnp.clip(by0, -wr, H) + wr
            if fme:
                lane = 4 * jnp.clip(bx0, -wc, W) + 512
            else:
                lane = jnp.clip(bx0, -wc, W) + 128
            return r, lane

        def dma_for(s):
            r, lane = origin(s)
            return pltpu.make_async_copy(
                planes_hbm.at[:, pl.ds(pl.multiple_of((r // 8) * 8, 8), 32),
                              pl.ds(pl.multiple_of((lane // 128) * 128, 128), LF)],
                buf.at[s], dsem.at[s],
            )

        def issue(s, c):
            dma_for(s).start()
            return c

        jax.lax.fori_loop(0, S, issue, jnp.int32(0))

        # per-segment drain + barrel alignment, STATICALLY unrolled: the
        # conditions are SMEM scalars, the buffer index is static — both
        # per-segment-vector broadcasts over 4-D tiles and dynamic scratch
        # reads are unsupported under Mosaic (the window_fetch lessons)
        for s in range(S):
            dma_for(s).wait()
            cur = buf[s]                                   # (nref, 32, LF)
            r, lane = origin(s)
            remr = jax.lax.rem(r, 8)
            hleft = 32
            for kk in (4, 2, 1):                           # sublane barrel
                nh = hleft - kk
                cur = jnp.where((remr & kk) != 0, cur[:, kk : kk + nh, :], cur[:, :nh, :])
                hleft = nh
            cur = jax.lax.slice(cur, (0, 0, 0), (nref, wr, LF))
            remc = jax.lax.rem(lane, 128)
            wleft = LF
            # FME lane remainders are multiples of 4 (4c + 512 mod 128)
            for kk in ((64, 32, 16, 8, 4) if fme else (64, 32, 16, 8, 4, 2, 1)):
                nw = wleft - kk
                cur = jnp.where((remc & kk) != 0, cur[:, :, kk : kk + nw], cur[:, :, :nw])
                wleft = nw
            wK_ref[0, s] = jax.lax.slice(cur, (0, 0, 0), (nref, wr, LW))

        cmask = [cm_s[gidx * kl + i] != 0 for i in range(kl)]
        curs = curK_ref[0].astype(jnp.int32)  # (kl, S, n, nc)
        g_vec = seeds_v[...]
        # the reference-FIFO population mask rides SMEM (it is traced in the
        # mesh engine — a captured traced scalar is rejected by pallas_call);
        # nv == nref is the single-chip no-op
        mvs = FM.eval_chain_flat(wK_ref[0].astype(jnp.int32), curs, g_vec,
                                 xsK_ref[0], ys_ref[...], n, kl, dims, fme,
                                 nv_s[0], cmask, jnp)
        mK_ref[0] = mvs
        # static slice, not mvs[-1]: jnp int getitem lowers via dynamic_slice
        seeds_v[...] = jax.lax.index_in_dim(mvs, kl - 1, 0, keepdims=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Lp,),
        in_specs=[
            pl.BlockSpec((Lp * S,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((S,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Lp * kl,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, kl, S, n, nc), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kl, S, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, kl, S, 3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, nref, wr, LW), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, 3), jnp.int32),
            pltpu.VMEM((S, nref, 32, LF), jnp.int16),
            pltpu.SemaphoreType.DMA((S,)),
            pltpu.SMEM((S, 3), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    mK, wK = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Lp, kl, S, 3), jnp.int32),
            jax.ShapeDtypeStruct((Lp, S, nref, wr, LW), jnp.int16),
        ],
        # the statically-unrolled per-segment barrels put ~22 MB of
        # short-lived temporaries on the Mosaic value stack at S=135 —
        # raise the scoped-vmem cap (v5e VMEM is 128 MB; the resident
        # blocks + scratch total ~12 MB)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xs0.reshape(-1), ys, cmK.reshape(-1),
      jnp.asarray([nref if nvalid is None else nvalid], jnp.int32).reshape(1),
      planes_pad, curK, xsK.reshape(Lp, kl, S, 1), ys.reshape(S, 1), seeds)
    return mK, wK
