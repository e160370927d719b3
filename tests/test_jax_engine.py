"""Native JAX engine tests: self-consistency (encode->decode exact round
trip), agreement with the compat engine on search decisions, and quality
parity within transform tolerance."""
import numpy as np
import pytest

from streamoptima_tpu import bitstream as BS
from streamoptima_tpu.compat_engine import CompatCodec
from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.jax_engine import JaxCodec

from conftest import smooth_clip, synthetic_clip

FLAG_SETS = [
    ("plain", dict()),
    ("vbs", dict(vbs_enable=True)),
    ("fme", dict(fme_enable=True)),
    ("vbs_fme", dict(vbs_enable=True, fme_enable=True)),
    ("fast", dict(fast_me=True)),
    ("fast_fme_vbs", dict(fast_me=True, fme_enable=True, vbs_enable=True)),
]

TEST_TABLES = [
    [9000, 4000, 2000, 1100, 800, 600, 450, 350, 280, 230, 200, 180],
    [8000, 3500, 1800, 1000, 700, 500, 400, 300, 250, 210, 190, 170],
]


def make_cfg(h, w, frames, engine, **kw):
    base = dict(height=h, width=w, frames=frames, block_size=16, search_range=3,
                qp=4, intra_dur=3, intra_mode=0, lam=0.015, engine=engine)
    base.update(kw)
    return CodecConfig(**base)


@pytest.mark.parametrize("name,flags", FLAG_SETS)
def test_roundtrip_and_compat_agreement(name, flags):
    h, w, frames = 64, 64, 3
    y = smooth_clip(h, w, frames)
    cfg_j = make_cfg(h, w, frames, "jax", **flags)
    cj = JaxCodec(cfg_j, y)
    pkg = cj.encode()
    # self-consistency: decode(package) == in-loop reconstructions
    dec = cj.decode(pkg["frame_type_seq"], pkg["approx residual"],
                    pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i in range(frames):
        assert np.array_equal(dec[i], pkg["reconstructed frames"][i]), (name, i)

    cfg_c = make_cfg(h, w, frames, "compat", **flags)
    cc = CompatCodec(cfg_c, y)
    pkg_c = cc.encode()
    assert pkg["frame_type_seq"] == list(pkg_c["frame_type_seq"])
    # full-search MVs are transform-independent -> must match compat exactly
    if not flags.get("fast_me"):
        for i in range(frames):
            for j, ((sa, ma), (sb, mb)) in enumerate(zip(pkg["MVS per Frame"][i], pkg_c["MVS per Frame"][i])):
                if sa == 0 == sb:
                    assert tuple(np.atleast_1d(ma)) == tuple(np.atleast_1d(mb)), (name, i, j)
    # quality parity: tight for full search; fast-ME RD decisions legitimately
    # differ (native fixes quirk K6: real SADs instead of zeros in RD), and
    # native fixes quirk K18 (consistent FME bounds), so allow headroom but
    # never a material regression
    tol = 1.5 if flags.get("fast_me") else 0.35
    for a, b in zip(pkg["PSNR per frame"], pkg_c["PSNR per frame"]):
        assert a > b - tol, (name, pkg["PSNR per frame"], pkg_c["PSNR per frame"])


def test_bitstream_roundtrip_jax(tmp_path):
    h, w, frames = 64, 64, 3
    y = synthetic_clip(h, w, frames)
    cfg = make_cfg(h, w, frames, "jax", vbs_enable=True, fme_enable=True)
    cj = JaxCodec(cfg, y)
    pkg = cj.encode()
    BS.write_bitstream(tmp_path / "mv.txt", tmp_path / "res.txt", pkg["frame_type_seq"],
                       pkg["MVS per Frame"], pkg["Qp_per_row_per_frame"], pkg["approx residual"], cfg)
    fts, mvs, qps, res = BS.read_bitstream(tmp_path / "mv.txt", tmp_path / "res.txt", cfg)
    dec = cj.decode(fts, res, qps, mvs)
    for i in range(frames):
        assert np.array_equal(dec[i], pkg["reconstructed frames"][i]), i


def test_rc_and_promotion():
    h, w, frames = 64, 64, 4
    y = synthetic_clip(h, w, frames)
    cfg = make_cfg(h, w, frames, "jax", rc_flag=2, target_br="150 kbps",
                   qp_rate_tables=TEST_TABLES, intra_thresh=100, intra_dur=4)
    cj = JaxCodec(cfg, y)
    pkg = cj.encode()
    # tiny threshold forces promotion: all frames intra
    assert pkg["frame_type_seq"] == [0, 0, 0, 0]
    dec = cj.decode(pkg["frame_type_seq"], pkg["approx residual"],
                    pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i in range(frames):
        assert np.array_equal(dec[i], pkg["reconstructed frames"][i])


def test_intra_mode1_native():
    h, w, frames = 48, 64, 2
    y = smooth_clip(h, w, frames)
    cfg = make_cfg(h, w, frames, "jax", intra_mode=1, intra_dur=1)
    cj = JaxCodec(cfg, y)
    pkg = cj.encode()
    assert pkg["frame_type_seq"] == [0, 0]
    assert all(p > 20 for p in pkg["PSNR per frame"])
    dec = cj.decode(pkg["frame_type_seq"], pkg["approx residual"],
                    pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i in range(frames):
        assert np.array_equal(dec[i], pkg["reconstructed frames"][i])


def test_roi_qp_map():
    h, w, frames = 64, 64, 2
    y = synthetic_clip(h, w, frames)
    roi = np.zeros((4, 4), dtype=np.int32)
    roi[:2, :2] = -3  # higher quality top-left quadrant
    cfg = make_cfg(h, w, frames, "jax", roi_qp_map=roi, qp=6)
    cj = JaxCodec(cfg, y)
    pkg = cj.encode()
    dec = cj.decode(pkg["frame_type_seq"], pkg["approx residual"],
                    pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i in range(frames):
        assert np.array_equal(dec[i], pkg["reconstructed frames"][i])
    # ROI region must be higher fidelity than the rest on the intra frame
    rec = pkg["reconstructed frames"][0].astype(np.int64)
    src = y[0].astype(np.int64)
    mse_roi = ((rec - src)[:32, :32] ** 2).mean()
    mse_rest = ((rec - src)[32:, 32:] ** 2).mean()
    assert mse_roi < mse_rest


def test_nref_multi():
    h, w, frames = 64, 64, 4
    y = smooth_clip(h, w, frames)
    cfg = make_cfg(h, w, frames, "jax", n_ref_frames=2, intra_dur=4)
    cj = JaxCodec(cfg, y)
    pkg = cj.encode()
    dec = cj.decode(pkg["frame_type_seq"], pkg["approx residual"],
                    pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i in range(frames):
        assert np.array_equal(dec[i], pkg["reconstructed frames"][i]), i
    # at least one block should reference the older frame at some point
    refs_used = {mv[1][2] for f in pkg["MVS per Frame"][2:] for mv in f if mv[0] == 0}
    assert 0 in refs_used  # sanity; index 1 may or may not appear


def test_mode2_fast_me_vectorized_matches_compat():
    """ParallelMode 2 + fast ME: the native engine's chain-free vectorized
    path (mvp=(0,0,0) per block) must pick exactly the compat engine's MVs
    (same 3x3 candidates, K7 bounds, and (ref, dx, dy) tie-break)."""
    h, w, frames = 64, 64, 3
    y = smooth_clip(h, w, frames)
    pj = JaxCodec(make_cfg(h, w, frames, "jax", parallel_mode=2, fast_me=True), y).encode()
    pc = CompatCodec(make_cfg(h, w, frames, "compat", parallel_mode=2, fast_me=True), y).encode()
    assert pj["frame_type_seq"] == list(pc["frame_type_seq"])
    for i in range(frames):
        if pj["frame_type_seq"][i] != 1:
            continue
        for j, ((sa, ma), (sb, mb)) in enumerate(zip(pj["MVS per Frame"][i], pc["MVS per Frame"][i])):
            assert sa == sb and tuple(ma) == tuple(mb), (i, j, ma, mb)


def test_mode2_fast_me_fme():
    """Mode 2 fast ME under FME round-trips and matches compat MVs."""
    h, w, frames = 64, 64, 3
    y = smooth_clip(h, w, frames)
    cfg = make_cfg(h, w, frames, "jax", parallel_mode=2, fast_me=True, fme_enable=True)
    cj = JaxCodec(cfg, y)
    pkg = cj.encode()
    dec = cj.decode(pkg["frame_type_seq"], pkg["approx residual"],
                    pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i in range(frames):
        assert np.array_equal(dec[i], pkg["reconstructed frames"][i])
    pc = CompatCodec(make_cfg(h, w, frames, "compat", parallel_mode=2, fast_me=True, fme_enable=True), y).encode()
    for i in range(frames):
        if pkg["frame_type_seq"][i] != 1:
            continue
        for j, ((sa, ma), (sb, mb)) in enumerate(zip(pkg["MVS per Frame"][i], pc["MVS per Frame"][i])):
            assert sa == sb and tuple(ma) == tuple(mb), (i, j, ma, mb)


@pytest.mark.parametrize("bs", [8, 32])
def test_block_size_generality(bs):
    """Non-default block sizes round-trip, and the native search agrees with
    the compat search bit-for-bit on identical inputs (the reference
    parameterizes block_size throughout, Encoder.py:24).  Whole-clip MV
    parity is NOT asserted: the engines' reconstructions differ by +-1
    (int DCT vs scipy), so later frames search legitimately different refs."""
    y = smooth_clip(64, 64, 3)
    cfg = make_cfg(64, 64, 3, "jax", block_size=bs, vbs_enable=True)
    cj = JaxCodec(cfg, y)
    pkg = cj.encode()
    dec = cj.decode(pkg["frame_type_seq"], pkg["approx residual"],
                    pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"])
    for i in range(3):
        assert np.array_equal(dec[i], pkg["reconstructed frames"][i])
    # search primitives on identical inputs
    from streamoptima_tpu.core import me as M

    cc = CompatCodec(make_cfg(64, 64, 3, "compat", block_size=bs, vbs_enable=True), y)
    cur = y[1].astype(np.int32)
    ref = y[0].astype(np.int32)
    out_n = M.full_search_materialized(cur, ref[None], 3, bs, bs // 2, 1, False, True, np)
    out_c = cc._full_search(cur, ref[None].astype(np.float64), False)
    np.testing.assert_array_equal(out_n["mv"], np.asarray(out_c["mv"]))
    np.testing.assert_array_equal(out_n["sub_mv"], np.asarray(out_c["sub_mv"]))


def test_ssim_jax_matches_host():
    """Device SSIM (integer-exact window sums) vs the float64 host twin —
    well under the 1e-6 bar (round-1 VERDICT item 10)."""
    import numpy as np

    from conftest import smooth_clip, synthetic_clip
    from streamoptima_tpu import metrics

    rng = np.random.default_rng(5)
    for clip in (synthetic_clip(64, 96, 2), smooth_clip(64, 96, 2)):
        a = clip[0]
        b = np.clip(clip[1].astype(np.int32) + rng.integers(-5, 5, clip[1].shape), 0, 255).astype(np.uint8)
        host = metrics.ssim(a, b)
        dev = metrics.ssim_frames(a[None], b[None])[0]
        assert abs(host - dev) < 1e-6, (host, dev)


@pytest.mark.parametrize("flags", [
    dict(),
    dict(vbs_enable=True, fme_enable=True),
    dict(n_ref_frames=3, fme_enable=True),
])
def test_fast_me_fixpoint_matches_scan(flags):
    """The Jacobi fixpoint and row-segmented (rowscan, the default) chain
    solvers must be bit-identical to the literal lax.scan of the MVP chain
    — on pure noise, the worst case for convergence (every block's MV breaks
    the previous block's prediction)."""
    import dataclasses

    h, w, frames = 64, 96, 4
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, size=(frames, h, w), dtype=np.uint8)
    cfg = make_cfg(h, w, frames, "jax", fast_me=True, fast_me_chain="scan", **flags)
    a = JaxCodec(cfg, y).encode()
    # rowscan segment multipliers: w=96 -> nbc=6, so k=2/3 cut every block
    # row into segments that CROSS row boundaries — the fixpoint must not
    # depend on the segmentation (cfg.fast_me_seg_mult docstring).
    # lookahead k: the speculative multi-column chain step (fastme.eval_chain)
    # must be bit-identical for every k, including k=1 (the legacy per-column
    # step), non-divisors of the segment length (nbc=6: k=4 pads the tail)
    # and k > nbc (clamped); composed with a seg_mult cut that crosses rows.
    for chain, seg, look in (("fixpoint", "auto", "auto"), ("rowscan", "auto", 1),
                             ("rowscan", "auto", 2), ("rowscan", "auto", 3),
                             ("rowscan", "auto", 4), ("rowscan", "auto", "auto"),
                             ("rowscan", "auto", 9), ("rowscan", 2, 2),
                             ("rowscan", 3, "auto"), ("rowscan", 6, 1)):
        b = JaxCodec(dataclasses.replace(cfg, fast_me_chain=chain,
                                         fast_me_seg_mult=seg,
                                         fast_me_lookahead=look), y).encode()
        np.testing.assert_array_equal(a["reconstructed frames"], b["reconstructed frames"])
        for fa, fb in zip(a["MVS per Frame"], b["MVS per Frame"]):
            assert fa == fb
        for fa, fb in zip(a["approx residual"], b["approx residual"]):
            assert str(fa) == str(fb)


def test_roi_bitstream_self_describing(tmp_path):
    """Round-2 VERDICT item 5: the per-block QP-offset map rides the
    bitstream (MV-file "roi|" header), so a decoder built from a DEFAULT cfg
    (no roi_qp_map) reconstructs ROI streams exactly; conflicting or missing
    maps fail loudly instead of silently decoding garbage."""
    import dataclasses

    from streamoptima_tpu import bitstream as BS

    h, w, frames = 64, 64, 3
    y = synthetic_clip(h, w, frames)
    roi = np.zeros((4, 4), dtype=np.int32)
    roi[:2, :2] = -3
    cfg = make_cfg(h, w, frames, "jax", roi_qp_map=roi, qp=6, intra_dur=2)
    cj = JaxCodec(cfg, y)
    pkg = cj.encode()
    mv_p, res_p = str(tmp_path / "mv.txt"), str(tmp_path / "res.txt")
    BS.write_bitstream(mv_p, res_p, pkg["frame_type_seq"], pkg["MVS per Frame"],
                       pkg["Qp_per_row_per_frame"], pkg["approx residual"], cfg)
    assert open(mv_p).readline().startswith("roi|")

    # default cfg adopts the stream's map and reconstructs bit-exactly
    bare = dataclasses.replace(cfg, roi_qp_map=None)
    fts, mvs, qps, res = BS.read_bitstream(mv_p, res_p, bare)
    assert bare.roi_qp_map is not None
    dec = JaxCodec(bare).decode(fts, res, qps, mvs)
    np.testing.assert_array_equal(np.stack([np.asarray(f) for f in dec]),
                                  pkg["reconstructed frames"])

    # conflicting map: loud failure
    import pytest

    wrong = dataclasses.replace(cfg, roi_qp_map=roi + 1)
    with pytest.raises(ValueError, match="differs"):
        BS.read_bitstream(mv_p, res_p, wrong)

    # cfg map against a plain stream: loud failure
    plain_cfg = dataclasses.replace(cfg, roi_qp_map=None)
    plain = JaxCodec(plain_cfg, y).encode()
    mv2, res2 = str(tmp_path / "mv2.txt"), str(tmp_path / "res2.txt")
    BS.write_bitstream(mv2, res2, plain["frame_type_seq"], plain["MVS per Frame"],
                       plain["Qp_per_row_per_frame"], plain["approx residual"], plain_cfg)
    with pytest.raises(ValueError, match="no ROI header"):
        BS.read_bitstream(mv2, res2, dataclasses.replace(cfg, roi_qp_map=roi))


def test_roi_adoption_not_sticky(tmp_path):
    """A map ADOPTED from one stream must not poison later decodes (round-3
    review): the same codec decodes an ROI stream, then a plain stream, then
    a different-ROI stream; a USER-set map stays strict."""
    from streamoptima_tpu.codec import VideoCodec

    h, w, frames = 64, 64, 2
    y = synthetic_clip(h, w, frames)
    roi_a = np.zeros((4, 4), np.int32); roi_a[0, 3] = -3
    roi_b = np.zeros((4, 4), np.int32); roi_b[3, 0] = -2
    streams = {}
    for name, roi in (("a", roi_a), ("b", roi_b), ("plain", None)):
        cfg = make_cfg(h, w, frames, "jax", roi_qp_map=roi, intra_dur=2)
        codec = VideoCodec(cfg, y)
        pkg = codec.encode()
        mv, res = str(tmp_path / f"mv_{name}.txt"), str(tmp_path / f"res_{name}.txt")
        codec.transmit_bitstream(mv, res)
        streams[name] = (mv, res, pkg["reconstructed frames"])
    dec = VideoCodec(make_cfg(h, w, frames, "jax", intra_dur=2))
    for name in ("a", "plain", "b", "a", "plain"):
        mv, res, want = streams[name]
        got = dec.decode_bitstream(mv, res)
        np.testing.assert_array_equal(got, want, err_msg=name)
    # a USER-set map still conflicts loudly in both directions
    strict = VideoCodec(make_cfg(h, w, frames, "jax", roi_qp_map=roi_a, intra_dur=2))
    with pytest.raises(ValueError, match="differs"):
        strict.decode_bitstream(*streams["b"][:2])
    with pytest.raises(ValueError, match="no ROI header"):
        strict.decode_bitstream(*streams["plain"][:2])


def test_roi_stream_compat_engine_loud(tmp_path):
    """An ROI stream reaching the compat engine must raise a meaningful
    error, not JaxCodec's bare constructor assert (round-3 review)."""
    from streamoptima_tpu.codec import VideoCodec

    h, w, frames = 64, 64, 2
    y = synthetic_clip(h, w, frames)
    roi = np.zeros((4, 4), np.int32); roi[0, 0] = -3
    enc = VideoCodec(make_cfg(h, w, frames, "jax", roi_qp_map=roi, intra_dur=2), y)
    enc.encode()
    mv, res = str(tmp_path / "mv.txt"), str(tmp_path / "res.txt")
    enc.transmit_bitstream(mv, res)
    dec = VideoCodec(make_cfg(h, w, frames, "compat", intra_dur=2, search_range=2))
    with pytest.raises(ValueError, match="compat"):
        dec.decode_bitstream(mv, res)


def test_intra_mode1_roi_lands_on_pixel_blocks():
    """intra_mode=1 stores blocks in TRANSPOSED raster order; ROI offsets
    (and RC row QPs) must still land on PIXEL positions (round-3 review:
    they used to apply transposed — roi[0, 3] degraded pixel block (3, 0)).
    Non-square frame so the transpose cannot alias."""
    h, w, frames = 48, 80, 2
    y = synthetic_clip(h, w, frames)
    nbr, nbc = h // 16, w // 16
    roi = np.zeros((nbr, nbc), np.int32)
    roi[0, 4] = 6  # heavily degrade pixel block row 0, col 4 ONLY
    base = make_cfg(h, w, frames, "jax", intra_mode=1, intra_dur=1, qp=1)
    cj0 = JaxCodec(base, y)
    p0 = cj0.encode()
    cj1 = JaxCodec(make_cfg(h, w, frames, "jax", intra_mode=1, intra_dur=1, qp=1,
                            roi_qp_map=roi), y)
    p1 = cj1.encode()

    def block_err(pkg, r, c):
        d = pkg["reconstructed frames"][1].astype(np.int64) - y[1].astype(np.int64)
        return np.abs(d[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16]).mean()

    # the targeted pixel block degrades; the transposed-alias position (4, 0)
    # must NOT be the degraded one
    assert block_err(p1, 0, 4) > block_err(p0, 0, 4) + 1.0
    assert block_err(p1, 2, 0) <= block_err(p0, 2, 0) + 0.5  # (4,0) OOB: nbr=3; spot-check col 0
    # roundtrip stays exact
    dec = cj1.decode(p1["frame_type_seq"], p1["approx residual"],
                     p1["Qp_per_row_per_frame"], p1["MVS per Frame"])
    np.testing.assert_array_equal(np.stack([np.asarray(f) for f in dec]),
                                  p1["reconstructed frames"])


def test_encode_drain_bounded_hbm(tmp_path):
    """cfg.encode_drain: outputs behind the lag are host arrays (device
    buffers freed — long clips used to grow HBM without bound), and the
    drained per_frame still serializes byte-identically."""
    import dataclasses

    from streamoptima_tpu import bitstream as BS

    y = synthetic_clip(64, 96, 10)
    base = make_cfg(64, 96, 10, "jax", vbs_enable=True, intra_dur=5)
    cfg = dataclasses.replace(base, encode_drain=2)
    codec = JaxCodec(cfg, y)
    pkg = codec.encode(package=False)
    pf = pkg["per_frame"]
    assert all(isinstance(o["qtc_full"], np.ndarray) for o in pf[:-2]), "not drained"
    ref = JaxCodec(base, y).encode(package=False)
    a_mv, a_res = tmp_path / "a.mv", tmp_path / "a.res"
    b_mv, b_res = tmp_path / "b.mv", tmp_path / "b.res"
    BS.write_bitstream_arrays(a_mv, a_res, pkg["frame_type_seq"], pf,
                              pkg["Qp_per_row_per_frame"], cfg)
    BS.write_bitstream_arrays(b_mv, b_res, ref["frame_type_seq"], ref["per_frame"],
                              ref["Qp_per_row_per_frame"], base)
    assert a_mv.read_text() == b_mv.read_text()
    assert a_res.read_text() == b_res.read_text()
    np.testing.assert_array_equal(pkg["reconstructed frames"], ref["reconstructed frames"])


@pytest.mark.parametrize("sr", [2, 8, 15])
def test_intra_wavefront_matches_scan(sr):
    """The bounded-depth parallel intra reconstruction (sr < bs collapses
    the column scan to ceil(bs/(bs-sr)) passes) must equal the sequential
    select-scan bit for bit — including the adversarial max-reach pattern
    (mv = -sr everywhere) and corrupt mvs outside [-sr, 0]."""
    import jax.numpy as jnp
    from streamoptima_tpu.core import intra as I

    # nbc must EXCEED the worst-case dependency depth (sr=15 -> depth 15,
    # iters 16) or an undercounted iteration formula would still pass
    # (round-3 review finding): 352/16 = 22 columns > 16
    h, w, bs = 64, 352, 16
    nbr, nbc, s = h // bs, w // bs, bs // 2
    nb = nbr * nbc
    rng = np.random.default_rng(5)
    for trial in range(3):
        rf = rng.integers(-50, 51, (nb, bs, bs)).astype(np.int32)
        rq = rng.integers(-50, 51, (nb, 4, s, s)).astype(np.int32)
        sp = rng.random(nb) < 0.5
        if trial == 0:
            mv = np.full(nb, -sr, np.int32); smv = np.full((nb, 4), -sr, np.int32)
        elif trial == 1:
            mv = rng.integers(-sr - 3, 3, nb).astype(np.int32)
            smv = rng.integers(-sr - 3, 3, (nb, 4)).astype(np.int32)
        else:
            mv = rng.integers(-sr, 1, nb).astype(np.int32)
            smv = rng.integers(-sr, 1, (nb, 4)).astype(np.int32)
        mv.reshape(nbr, nbc)[:, 0] = -1
        g = lambda a, shp: jnp.asarray(a).reshape(shp)  # noqa: E731
        args = (g(rf, (nbr, nbc, bs, bs)), g(rq, (nbr, nbc, 4, s, s)),
                g(sp, (nbr, nbc)), g(mv, (nbr, nbc)), g(smv, (nbr, nbc, 4)), h, w, bs, sr)
        want = I._intra_reconstruct_jax_select(*args)
        got = I._intra_reconstruct_jax_wavefront(*args)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"sr={sr} trial={trial}")
