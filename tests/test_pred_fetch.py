"""Decode-side Pallas prediction fetch (core/me_pallas.pred_fetch_compact).

The kernel must be bit-identical to pred.gather_predictions (the decoder's
reference gather, decoder.py:97-211 semantics): exactly on every block
whole-pel (cases A and C — the plane zero-padding IS the reference's
zero-fill), and on case-A blocks under FME (case B is the caller's 128 mask,
case C falls back to the XLA step via JaxCodec._pallas_decodable).
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from streamoptima_tpu import CodecConfig
from streamoptima_tpu.core import me_pallas as MP
from streamoptima_tpu.core import me as M
from streamoptima_tpu.core import pred as P
from streamoptima_tpu.jax_engine import JaxCodec

from conftest import synthetic_clip


def _grids(h, w, bs, sbs):
    nbr, nbc = h // bs, w // bs
    by, bx = np.meshgrid(np.arange(nbr) * bs, np.arange(nbc) * bs, indexing="ij")
    bx, by = bx.reshape(-1), by.reshape(-1)
    qx = np.stack([bx + dx for dy in (0, sbs) for dx in (0, sbs)], 1)
    qy = np.stack([by + dy for dy in (0, sbs) for dx in (0, sbs)], 1)
    return bx, by, qx, qy


def _plane(blocks, xs, ys, n, h, w):
    out = np.zeros((h, w), np.int64)
    for i in range(len(blocks)):
        out[ys[i]:ys[i] + n, xs[i]:xs[i] + n] = blocks[i]
    return out


@pytest.mark.parametrize("fme", [False, True])
def test_fetch_matches_gather(fme):
    rng = np.random.default_rng(7)
    h, w, bs, sbs, nref, sr = 48, 64, 16, 8, 2, 4
    refs = rng.integers(0, 256, (nref, h, w), dtype=np.uint8).astype(np.int32)
    bx, by, qx, qy = _grids(h, w, bs, sbs)
    nb = len(bx)
    bound = 2 * sr if fme else sr

    def rand_mv(n):
        mv = np.zeros((n, 3), np.int32)
        mv[:, 0] = rng.integers(-bound, bound + 1, n)
        mv[:, 1] = rng.integers(-bound, bound + 1, n)
        mv[:, 2] = rng.integers(0, nref, n)
        return mv

    mv = rand_mv(nb)
    smv = np.stack([rand_mv(nb) for _ in range(4)], 1)
    tab, pad = MP.build_fetch_table(mv, smv, sr, fme, True, h // bs, w // bs, bs)
    predf, predq = MP.pred_fetch_compact(
        jnp.asarray(mv), jnp.asarray(smv), jnp.asarray(refs), jnp.asarray(tab),
        pad, bs, sbs, True, fme, interpret=True, wrap_row_pass=True,
    )
    predf, predq = np.asarray(predf).astype(np.int64), np.asarray(predq).astype(np.int64)

    stack = np.stack([M.fme_upsample(r, np, wrap_row_pass=True) for r in refs]) if fme else refs
    exp_f = _plane(P.gather_predictions(mv, stack, bx, by, bs, fme, np), bx, by, bs, h, w)
    exp_q = _plane(
        P.gather_predictions(smv.reshape(-1, 3), stack, qx.reshape(-1), qy.reshape(-1), sbs, fme, np),
        qx.reshape(-1), qy.reshape(-1), sbs, h, w,
    )
    if not fme:
        np.testing.assert_array_equal(predf, exp_f)
        np.testing.assert_array_equal(predq, exp_q)
        return

    # FME: compare on case-A blocks only
    H2, W2 = 2 * h - 1, 2 * w - 1

    def caseA(mv3, xs, ys, n):
        px, py = 2 * xs + mv3[:, 0], 2 * ys + mv3[:, 1]
        v1 = (px >= 0) & (px < W2 - n) & (py >= 0) & (py < H2 - n)
        v2 = (px + 2 * n >= 0) & (px + 2 * n < W2 - n) & (py + 2 * n >= 0) & (py + 2 * n < H2 - n)
        return v1 & v2

    a_f = caseA(mv, bx, by, bs)
    a_q = caseA(smv.reshape(-1, 3), qx.reshape(-1), qy.reshape(-1), sbs)
    assert a_f.sum() and a_q.sum(), "degenerate draw: no case-A blocks"
    maskf = np.repeat(np.repeat(a_f.reshape(h // bs, w // bs), bs, 0), bs, 1)
    maskq = _plane(a_q.astype(np.int64), qx.reshape(-1), qy.reshape(-1), sbs, h, w) > 0
    np.testing.assert_array_equal(np.where(maskf, predf, 0), np.where(maskf, exp_f, 0))
    np.testing.assert_array_equal(np.where(maskq, predq, 0), np.where(maskq, exp_q, 0))


def test_fetch_table_buckets_and_reject():
    rng = np.random.default_rng(0)
    mv = np.zeros((9000, 3), np.int32)
    smv = np.zeros((4, 4, 3), np.int32)
    t, pad = MP.build_fetch_table(mv[:4], smv, 8, False, True, 1, 4, 16)
    assert t.shape == (1, 5, MP.FETCH_BUCKETS[0]) and pad == 8
    assert int((t[0, 4] != -1).sum()) == 1  # one distinct MV
    # a band with more distinct MVs than the largest bucket -> None (XLA
    # fallback); 75x120 grid, band<=16 rows -> ~1900 distinct per band
    mv[:, 0] = rng.integers(-60, 61, 9000)
    mv[:, 1] = rng.integers(-60, 61, 9000)
    mv[:, 2] = rng.integers(0, 4, 9000)
    band = MP.fetch_band_rows(75, 120 * 16, 16, False)
    per_band = len(np.unique(mv.reshape(75, 120, 3)[:band].reshape(-1, 3), axis=0))
    if per_band > MP.FETCH_BUCKETS[-1]:
        assert MP.build_fetch_table(mv, smv, 60, False, False, 75, 120, 16) is None


@pytest.mark.parametrize("fme,vbs", [(False, False), (True, True)])
def test_decode_pallas_dispatch_roundtrip(fme, vbs):
    """JaxCodec.decode with me_search='pallas' must reproduce the encoder's
    reconstructions bit-exactly through the fetch-kernel decode step."""
    clip = synthetic_clip(h=64, w=64, frames=5, motion=2)
    cfg = CodecConfig(height=64, width=64, frames=5, qp=4, intra_dur=4, search_range=4,
                      vbs_enable=vbs, fme_enable=fme, engine="jax", me_search="pallas")
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode()
    # the dispatch predicate must accept well-formed full-search streams
    mv, split, smv = codec._list_to_mvs(pkg["MVS per Frame"][1], 1)
    assert codec._fetch_table(mv, smv) is not None
    dec = codec.decode(pkg["frame_type_seq"], pkg["approx residual"],
                       pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i, (d, r) in enumerate(zip(dec, pkg["reconstructed frames"])):
        np.testing.assert_array_equal(np.asarray(d), r, err_msg=f"frame {i}")


def test_decode_dispatch_rejects_oversized_mv():
    """Fast-ME chains can exceed the search range; the dispatch must refuse
    (and the XLA step still decodes them)."""
    clip = synthetic_clip(h=64, w=64, frames=3, motion=2)
    cfg = CodecConfig(height=64, width=64, frames=3, qp=4, intra_dur=4, search_range=4,
                      vbs_enable=False, fme_enable=False, engine="jax", me_search="pallas")
    codec = JaxCodec(cfg, clip)
    mv = np.zeros((codec.nb, 3), np.int32)
    mv[0, 0] = 9  # beyond sr=4
    smv = np.zeros((codec.nb, 4, 3), np.int32)
    assert not codec._pallas_decodable(mv, smv)
    assert codec._pallas_decodable(np.zeros((codec.nb, 3), np.int32), smv)


@pytest.mark.parametrize("tile_comm,fme", [("halo", False), ("halo", True),
                                           ("all_gather", True)])
def test_sharded_decode_fetch_matches_single_chip(tile_comm, fme):
    """Mesh decode through the Pallas fetch kernel (me_search='pallas',
    per-frame host tables, halo/all_gather bands) == encoder reconstruction
    == XLA-path mesh decode."""
    from streamoptima_tpu.parallel import ShardedCodec, make_mesh

    clip = synthetic_clip(h=64, w=64, frames=6, motion=2)
    cfg = CodecConfig(height=64, width=64, frames=6, search_range=4, qp=4, intra_dur=3,
                      vbs_enable=fme, fme_enable=fme, me_search="pallas")
    sc = ShardedCodec(cfg, make_mesh(cfg), clip, tile_comm=tile_comm)
    pkg = sc.encode()
    args = (pkg["frame_type_seq"], pkg["approx residual"],
            pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    sharded = np.stack([np.asarray(f) for f in sc.decode(*args)])
    assert any(k[0] for k in sc._decode_js), "decode fell back to the XLA path"
    np.testing.assert_array_equal(sharded, pkg["reconstructed frames"])


def test_decode_dispatch_rejects_bad_ref_index():
    """Corrupt streams with out-of-range ref indices must not reach the
    fetch kernel (they would drive out-of-bounds DMAs; the XLA gather path
    clamps instead)."""
    cfg = CodecConfig(height=64, width=64, frames=3, qp=4, intra_dur=4, search_range=4,
                      vbs_enable=False, fme_enable=False, engine="jax", me_search="pallas")
    codec = JaxCodec(cfg, synthetic_clip(h=64, w=64, frames=3))
    mv = np.zeros((codec.nb, 3), np.int32)
    smv = np.zeros((codec.nb, 4, 3), np.int32)
    assert codec._pallas_decodable(mv, smv, nref=1)
    mv[5, 2] = 2  # ref index beyond the 1-deep FIFO
    assert not codec._pallas_decodable(mv, smv, nref=1)
    mv[5, 2] = -1
    assert not codec._pallas_decodable(mv, smv, nref=4)


def test_decode_pallas_dispatch_with_rate_control():
    """Fetch-path decode under RC (per-row QPs from the bitstream) must
    reproduce the encoder's reconstructions (decoder.py:112-114 semantics)."""
    tables = [[99000, 60000, 40000, 26000, 17000, 11000, 7200, 4800, 3200, 2100, 1400, 950],
              [60000, 36000, 24000, 16000, 10000, 6600, 4400, 2900, 1900, 1300, 850, 560]]
    clip = synthetic_clip(h=64, w=64, frames=5, motion=2)
    cfg = CodecConfig(height=64, width=64, frames=5, qp=4, intra_dur=4, search_range=4,
                      vbs_enable=True, fme_enable=True, lam=0.015, me_search="pallas",
                      rc_flag=1, target_br="640 kbps", frame_rate=30, qp_rate_tables=tables)
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode()
    dec = codec.decode(pkg["frame_type_seq"], pkg["approx residual"],
                       pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i, (d, r) in enumerate(zip(dec, pkg["reconstructed frames"])):
        np.testing.assert_array_equal(np.asarray(d), r, err_msg=f"frame {i}")


def test_decode_pallas_dispatch_multi_ref():
    """Fetch-path decode with a deep reference FIFO (n_ref_frames=3): the
    table's plane-stack leading index must select the right reference."""
    clip = synthetic_clip(h=64, w=64, frames=7, motion=2)
    cfg = CodecConfig(height=64, width=64, frames=7, qp=4, intra_dur=7, search_range=4,
                      vbs_enable=True, fme_enable=True, lam=0.015,
                      n_ref_frames=3, engine="jax", me_search="pallas")
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode()
    # the encoder must actually have used refs beyond index 0 for the test
    # to bite; synthetic motion content reliably does by frame 4+
    refs_used = {m[1][2] if m[0] == 0 else m[1][0][2] for m in pkg["MVS per Frame"][4]}
    dec = codec.decode(pkg["frame_type_seq"], pkg["approx residual"],
                       pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i, (d, r) in enumerate(zip(dec, pkg["reconstructed frames"])):
        np.testing.assert_array_equal(np.asarray(d), r, err_msg=f"frame {i}")


def test_corrupt_residual_overflow_raises():
    """Coefficients beyond the int16 interchange bound (impossible in
    well-formed streams: |qtc| <= 4080) raise instead of wrapping."""
    from streamoptima_tpu.jax_engine import list_to_res_np

    good = [(0, [[0] * 16] * 16) for _ in range(4)]
    qf, qq = list_to_res_np(good, 4, 16, 8)
    assert qf.dtype == np.int16
    bad = list(good)
    blk = [[0] * 16 for _ in range(16)]
    blk[0][0] = 70000  # far beyond any real quantized coefficient
    bad[1] = (0, blk)
    with pytest.raises((OverflowError, ValueError)):
        list_to_res_np(bad, 4, 16, 8)


def test_decode_pallas_dispatch_with_roi():
    """Fetch-path decode under a ROI QP map (per-block QP offsets applied in
    _block_qps on both encode and decode) must round-trip bit-exactly."""
    clip = synthetic_clip(h=64, w=64, frames=4, motion=2)
    nb = (64 // 16) * (64 // 16)
    roi = np.zeros(nb, np.int32)
    roi[: nb // 2] = -2  # better quality top half
    cfg = CodecConfig(height=64, width=64, frames=4, qp=5, intra_dur=4, search_range=4,
                      vbs_enable=True, fme_enable=True, lam=0.015,
                      me_search="pallas", roi_qp_map=roi.tolist())
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode()
    dec = codec.decode(pkg["frame_type_seq"], pkg["approx residual"],
                       pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i, (d, r) in enumerate(zip(dec, pkg["reconstructed frames"])):
        np.testing.assert_array_equal(np.asarray(d), r, err_msg=f"frame {i}")


def test_pred_fetch_nondivisor_band(monkeypatch):
    """Fetch kernel with a VMEM-sized band that does not divide nbr (VERDICT
    r3 item 3): forced band=2 over nbr=5 must match the natural program."""
    import jax.numpy as jnp
    from streamoptima_tpu.core import me_pallas

    rng = np.random.default_rng(8)
    h, w, sr = 80, 128, 4
    nbr, nbc = h // 16, w // 16
    nb = nbr * nbc
    refs = jnp.asarray(rng.integers(0, 256, (2, h, w)), jnp.uint8)
    mv = np.stack([rng.integers(-sr, sr + 1, nb), rng.integers(-sr, sr + 1, nb),
                   rng.integers(0, 2, nb)], axis=1).astype(np.int32)
    smv = np.stack([rng.integers(-sr, sr + 1, (nb, 4)), rng.integers(-sr, sr + 1, (nb, 4)),
                    rng.integers(0, 2, (nb, 4))], axis=2).astype(np.int32)
    def run():
        # builder and kernel share fetch_band_rows, so the table must be
        # rebuilt under the same banding the kernel will compute
        t = me_pallas.build_fetch_table(mv, smv, sr, False, True, nbr, nbc, 16)
        assert t is not None
        args = (jnp.asarray(mv), jnp.asarray(smv), refs, jnp.asarray(t[0]),
                t[1], 16, 8, True, False)
        return me_pallas.pred_fetch_compact(*args, interpret=True)

    base = run()
    monkeypatch.setattr(me_pallas, "fetch_band_rows", lambda *a, **k: 2)
    me_pallas.pred_fetch_compact._clear_cache()
    padded = run()
    monkeypatch.undo()
    me_pallas.pred_fetch_compact._clear_cache()
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(padded[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(padded[1]))


@pytest.mark.parametrize("fme", [False, True])
def test_wide_fetch_matches_gather(fme):
    """WIDE fetch mode: transmitted displacements far beyond the search
    range (fast-ME MVP chains are unbounded) served by a wide_pad-sized
    plane, bit-identical to gather_predictions on the servable cases."""
    rng = np.random.default_rng(11)
    h, w, bs, sbs, nref, sr = 64, 128, 16, 8, 2, 2
    refs = rng.integers(0, 256, (nref, h, w), dtype=np.uint8).astype(np.int32)
    bx, by, qx, qy = _grids(h, w, bs, sbs)
    nb = len(bx)
    bound = 80  # >> sr: the narrow sr-derived pad cannot serve these

    def rand_mv(n):
        mv = np.zeros((n, 3), np.int32)
        mv[:, 0] = rng.integers(-bound, bound + 1, n)
        mv[:, 1] = rng.integers(-bound, bound + 1, n)
        mv[:, 2] = rng.integers(0, nref, n)
        return mv

    mv = rand_mv(nb)
    smv = np.stack([rand_mv(nb) for _ in range(4)], 1)
    wpad = MP.wide_pad([mv, smv.reshape(-1, 3)], sr, fme)
    assert wpad is not None and wpad > (sr + 1 if fme else sr)
    assert wpad % 32 == 0
    t = MP.build_fetch_table(mv, smv, sr, fme, True, h // bs, w // bs, bs,
                             pads=(wpad, wpad))
    assert t is not None
    predf, predq = MP.pred_fetch_compact(
        jnp.asarray(mv), jnp.asarray(smv), jnp.asarray(refs), jnp.asarray(t[0]),
        wpad, bs, sbs, True, fme, interpret=True, wrap_row_pass=True,
    )
    predf, predq = np.asarray(predf).astype(np.int64), np.asarray(predq).astype(np.int64)

    stack = np.stack([M.fme_upsample(r, np, wrap_row_pass=True) for r in refs]) if fme else refs
    exp_f = _plane(P.gather_predictions(mv, stack, bx, by, bs, fme, np), bx, by, bs, h, w)
    exp_q = _plane(
        P.gather_predictions(smv.reshape(-1, 3), stack, qx.reshape(-1), qy.reshape(-1), sbs, fme, np),
        qx.reshape(-1), qy.reshape(-1), sbs, h, w,
    )
    if not fme:
        np.testing.assert_array_equal(predf, exp_f)
        np.testing.assert_array_equal(predq, exp_q)
        return
    H2, W2 = 2 * h - 1, 2 * w - 1

    def caseA(mv3, xs, ys, n):
        px, py = 2 * xs + mv3[:, 0], 2 * ys + mv3[:, 1]
        v1 = (px >= 0) & (px < W2 - n) & (py >= 0) & (py < H2 - n)
        v2 = (px + 2 * n >= 0) & (px + 2 * n < W2 - n) & (py + 2 * n >= 0) & (py + 2 * n < H2 - n)
        return v1 & v2

    a_f = caseA(mv, bx, by, bs)
    a_q = caseA(smv.reshape(-1, 3), qx.reshape(-1), qy.reshape(-1), sbs)
    assert a_f.sum() and a_q.sum(), "degenerate draw: no case-A blocks"
    maskf = np.repeat(np.repeat(a_f.reshape(h // bs, w // bs), bs, 0), bs, 1)
    maskq = _plane(a_q.astype(np.int64), qx.reshape(-1), qy.reshape(-1), sbs, h, w) > 0
    np.testing.assert_array_equal(np.where(maskf, predf, 0), np.where(maskf, exp_f, 0))
    np.testing.assert_array_equal(np.where(maskq, predq, 0), np.where(maskq, exp_q, 0))


@pytest.mark.parametrize("fme", [False, True])
def test_wide_fetch_decode_roundtrip_fast_me(fme):
    """Facade decode of a fast-ME stream whose MVP chain walks beyond the
    search range: the WIDE fetch mode must keep the Pallas path and
    reproduce the encoder's reconstructions bit-exactly."""
    # smooth vertical sinusoid panning 8px/frame with sr=2: its SAD gradient
    # walks the MVP chain far past the search range (same construction as
    # test_parallel.test_halo_decode_fast_me_large_motion)
    h, w, frames, pan = 128, 64, 4, 8
    y = np.arange(h + pan * frames)
    base = np.clip(128 + 100 * np.sin(2 * np.pi * y / 32.0), 0, 255)[:, None]
    rng = np.random.default_rng(3)
    tex = rng.integers(-8, 9, size=(h + pan * frames, w))
    sheet = np.clip(base + tex, 0, 255).astype(np.uint8)
    clip = np.stack([sheet[i * pan : i * pan + h] for i in range(frames)])
    cfg = CodecConfig(height=h, width=w, frames=frames, qp=3, intra_dur=frames,
                      search_range=2, vbs_enable=fme, fme_enable=fme, fast_me=True,
                      engine="jax", me_search="pallas")
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode()
    # the stream must actually exceed the narrow bound somewhere
    big = max(
        abs(m[1][1])
        for ft, mvs in zip(pkg["frame_type_seq"], pkg["MVS per Frame"]) if ft == 1
        for m in mvs if m[0] == 0
    )
    assert big > (2 * cfg.search_range if fme else cfg.search_range), big
    # ... and the wide dispatch must actually serve it (not the XLA fallback)
    from streamoptima_tpu.core import me_pallas as _mp
    allmv = [np.asarray(codec._list_to_mvs(f, 1)[0]).reshape(-1, 3)
             for f, t in zip(pkg["MVS per Frame"], pkg["frame_type_seq"]) if t == 1]
    wp = _mp.wide_pad(allmv, cfg.search_range, fme)
    assert wp is not None and wp > (cfg.search_range + (1 if fme else 0))
    dec = codec.decode(pkg["frame_type_seq"], pkg["approx residual"],
                       pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i, (d, r) in enumerate(zip(dec, pkg["reconstructed frames"])):
        np.testing.assert_array_equal(np.asarray(d), r, err_msg=f"frame {i}")
