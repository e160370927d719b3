"""C++ native entropy/serialization: byte parity with the Python twins."""
import numpy as np
import pytest

from streamoptima_tpu import bitstream as BS
from streamoptima_tpu import native
from streamoptima_tpu.core.zigzag import rle_decode_block, rle_encode_block

pytestmark = pytest.mark.skipif(not native.available(), reason="g++ unavailable")


def _random_blocks(rng, nblocks, n, sparsity=0.7):
    b = rng.integers(-300, 300, size=(nblocks, n, n))
    mask = rng.random((nblocks, n, n)) < sparsity
    return np.where(mask, 0, b).astype(np.int64)


def test_rle_encode_blocks_matches_python():
    rng = np.random.default_rng(0)
    blocks = _random_blocks(rng, 50, 8)
    vals, offs = native.rle_encode_blocks(blocks)
    for i in range(50):
        expect = rle_encode_block(blocks[i])
        got = list(vals[offs[i] : offs[i + 1]])
        assert got == expect


def test_rle_roundtrip_native():
    rng = np.random.default_rng(1)
    for n in (4, 8, 16):
        blocks = _random_blocks(rng, 20, n)
        vals, offs = native.rle_encode_blocks(blocks)
        dec = native.rle_decode_blocks(vals, offs, n)
        np.testing.assert_array_equal(dec, blocks)


def test_rle_decode_matches_python():
    rng = np.random.default_rng(2)
    blocks = _random_blocks(rng, 10, 8)
    vals, offs = native.rle_encode_blocks(blocks)
    dec = native.rle_decode_blocks(vals, offs, 8)
    for i in range(10):
        py = rle_decode_block(rle_encode_block(blocks[i]), 8)
        np.testing.assert_array_equal(dec[i], py)


@pytest.mark.parametrize("numpy_repr", [False, True])
def test_residual_line_matches_python(numpy_repr):
    rng = np.random.default_rng(3)
    nb, bs = 12, 16
    qf = _random_blocks(rng, nb, bs)
    qq = _random_blocks(rng, nb * 4, bs // 2).reshape(nb, 4, bs // 2, bs // 2)
    split = rng.random(nb) < 0.4
    native_line = native.encode_residual_line(qf, qq, split, numpy_repr)
    residuals = [(1, [qq[i, q] for q in range(4)]) if split[i] else (0, qf[i]) for i in range(nb)]
    py_line = BS.encode_residual_frame(residuals, bs, numpy_repr)
    assert native_line == py_line


def test_edge_blocks():
    """All-zero, all-nonzero, single trailing value."""
    bs = 8
    zero = np.zeros((1, bs, bs), dtype=np.int64)
    full = np.full((1, bs, bs), 7, dtype=np.int64)
    tail = np.zeros((1, bs, bs), dtype=np.int64)
    tail[0, bs - 1, 0] = -5  # last position in diagonal order
    for blocks in (zero, full, tail):
        vals, offs = native.rle_encode_blocks(blocks)
        assert list(vals[: offs[1]]) == rle_encode_block(blocks[0])
        np.testing.assert_array_equal(native.rle_decode_blocks(vals, offs, bs)[0], blocks[0])


@pytest.mark.parametrize("numpy_repr", [False, True])
def test_parse_residual_line_matches_python(numpy_repr):
    """Native text parse -> device-shaped arrays, bit-identical to the Python
    decode_residual_frame + list_to_res_np chain."""
    from streamoptima_tpu.jax_engine import list_to_res_np

    rng = np.random.default_rng(4)
    nb, bs, sbs = 24, 16, 8
    qf = _random_blocks(rng, nb, bs, sparsity=0.9).clip(-3000, 3000)
    qq = _random_blocks(rng, nb * 4, sbs, sparsity=0.9).clip(-3000, 3000).reshape(nb, 4, sbs, sbs)
    split = rng.random(nb) < 0.4
    qf[split] = 0
    qq[~split] = 0
    line = BS.encode_residual_frame_arrays(qf, qq, split, numpy_repr)
    r = native.parse_residual_line(line, nb, bs)
    assert r is not None
    spn, qfn, qqn = r
    pqf, pqq = list_to_res_np(BS.decode_residual_frame(line, bs), nb, bs, sbs)
    np.testing.assert_array_equal(spn, split)
    np.testing.assert_array_equal(qfn, pqf)
    np.testing.assert_array_equal(qqn, pqq)


@pytest.mark.parametrize("ft,rc", [(0, False), (0, True), (1, False), (1, True)])
def test_parse_mv_line_matches_python(ft, rc):
    """Native MV parse vs decode_mv_frame + list_to_mvs_np, including the
    row-head QP chain (and quirk K11's intra-split-at-row-head never arises:
    row heads are border blocks, which VBS never splits)."""
    from streamoptima_tpu.jax_engine import list_to_mvs_np

    rng = np.random.default_rng(5)
    nb, nbc = 96, 8
    mvs = []
    for j in range(nb):
        split = (rng.random() < 0.4) and (j % nbc != 0)
        if ft == 0:
            mvs.append((1, [int(v) for v in rng.integers(-9, 1, 4)]) if split
                       else (0, int(rng.integers(-9, 1))))
        else:
            mk = lambda: tuple(int(v) for v in (rng.integers(-16, 17), rng.integers(-16, 17), rng.integers(0, 4)))  # noqa: E731
            mvs.append((1, [mk() for _ in range(4)]) if split else (0, mk()))
    qpr = [int(q) for q in rng.integers(0, 11, nb // nbc)]
    line = f"{ft}|" + BS.encode_mv_frame(ft, mvs, qpr, rc, nbc)
    r = native.parse_mv_line(line, rc, nbc, nb, nb // nbc)
    assert r is not None
    nft, nmv, nsp, nsmv, nqp = r
    pft, pmv, pqp = BS.decode_mv_frame(line, rc, nbc)
    assert nft == pft and nqp == pqp
    lmv, lsp, lsmv = list_to_mvs_np(pmv, ft, nb)
    amv, asp, asmv = list_to_mvs_np(BS.FrameMVArrays(nft, nmv, nsp, nsmv), ft, nb)
    np.testing.assert_array_equal(asp, lsp)
    np.testing.assert_array_equal(amv, lmv)
    np.testing.assert_array_equal(asmv, lsmv)


@pytest.mark.parametrize("ft,rc", [(0, False), (0, True), (1, False), (1, True)])
def test_encode_mv_line_matches_python(ft, rc):
    """Native MV-line serialization from device-shaped arrays is
    byte-identical to mvs_to_list + encode_mv_frame."""
    from streamoptima_tpu.jax_engine import list_to_mvs_np

    rng = np.random.default_rng(6)
    nb, nbc = 96, 8
    mvs = []
    for j in range(nb):
        split = (rng.random() < 0.4) and (j % nbc != 0)
        if ft == 0:
            mvs.append((1, [int(v) for v in rng.integers(-9, 1, 4)]) if split
                       else (0, int(rng.integers(-9, 1))))
        else:
            mk = lambda: tuple(int(v) for v in (rng.integers(-16, 17), rng.integers(-16, 17), rng.integers(0, 4)))  # noqa: E731
            mvs.append((1, [mk() for _ in range(4)]) if split else (0, mk()))
    qpr = [int(q) for q in rng.integers(0, 11, nb // nbc)]
    want = BS.encode_mv_frame(ft, mvs, qpr, rc, nbc)
    mv, sp, smv = list_to_mvs_np(mvs, ft, nb)
    got = native.encode_mv_line(ft, mv, sp, smv, qpr, rc, nbc)
    assert got == want


def test_parse_anomalies_fall_back():
    """Anomalous lines return None (the caller then re-parses in Python,
    keeping the loud corrupt-stream errors)."""
    assert native.parse_residual_line("0'([bogus])", 1, 16) is None
    assert native.parse_residual_line("0'([-1, 40000])", 1, 16) is None  # > int16
    assert native.parse_residual_line("0'([0]);0'([0])", 1, 16) is None  # too many
    assert native.parse_residual_line("0'([0])", 2, 16) is None  # too few
    assert native.parse_mv_line("2|0'(1, 2, 3)", False, 8, 1, 1) is None
    assert native.parse_mv_line("1|0'(1, 2)", False, 8, 1, 1) is None  # arity
    r = native.parse_mv_line("1|0'(np.int64(1), 2, 3)", False, 8, 1, 1)
    assert r is not None and r[1][0].tolist() == [1, 2, 3]
    # trailing ';' is malformed (the Python parser raises on the empty item);
    # native must reject it too, not accept what the list path always refused
    assert native.parse_residual_line("0'([-1, 5, 0]);", 1, 16) is None
    assert native.parse_mv_line("1|0'(1, 2, 3);", False, 8, 1, 1) is None


def test_parser_differential_fuzz():
    """Mutate valid lines at random bytes: the native parser must either
    reject (None -> Python fallback) or agree with the Python parser
    byte-for-byte whenever the Python parser itself succeeds.  Guards the
    strict-fallback contract: no silent divergence on odd-but-parseable
    streams."""
    from streamoptima_tpu.jax_engine import list_to_mvs_np, list_to_res_np

    rng = np.random.default_rng(7)
    nb, bs, sbs, nbc = 24, 16, 8, 4
    qf = _random_blocks(rng, nb, bs, sparsity=0.85).clip(-3000, 3000)
    qq = _random_blocks(rng, nb * 4, sbs, sparsity=0.85).clip(-3000, 3000).reshape(nb, 4, sbs, sbs)
    split = rng.random(nb) < 0.4
    qf[split] = 0
    qq[~split] = 0
    res_line = BS.encode_residual_frame_arrays(qf, qq, split, False)
    mvs = []
    for j in range(nb):
        sp = (rng.random() < 0.4) and (j % nbc != 0)
        mk = lambda: tuple(int(v) for v in (rng.integers(-4, 5), rng.integers(-4, 5), rng.integers(0, 2)))  # noqa: E731
        mvs.append((1, [mk() for _ in range(4)]) if sp else (0, mk()))
    mv_line = "1|" + BS.encode_mv_frame(1, mvs, [], False, nbc)

    alphabet = "0123456789-,;'()[]@| abn.int"
    for base, kind in ((res_line, "res"), (mv_line, "mv")):
        for _ in range(120):
            s = list(base)
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(0, len(s)))
                s[pos] = alphabet[int(rng.integers(0, len(alphabet)))]
            line = "".join(s)
            # strict-fallback contract, both directions: native rejecting is
            # always fine (Python then raises its own loud error), but if
            # native ACCEPTS, Python must also accept AND agree — a line the
            # list path refused must never decode silently via C++
            if kind == "res":
                got = native.parse_residual_line(line, nb, bs)
                if got is None:
                    continue
                py = list_to_res_np(BS.decode_residual_frame(line, bs), nb, bs, sbs)
                pysp = np.fromiter((sp for sp, _ in BS.decode_residual_frame(line, bs)),
                                   dtype=bool, count=nb)
                np.testing.assert_array_equal(got[0], pysp, err_msg=line[:80])
                np.testing.assert_array_equal(got[1], py[0], err_msg=line[:80])
                np.testing.assert_array_equal(got[2], py[1], err_msg=line[:80])
            else:
                got = native.parse_mv_line(line, False, nbc, nb, nb // nbc)
                if got is None:
                    continue
                ft, pmv, _ = BS.decode_mv_frame(line, False, nbc)
                lmv, lsp, lsmv = list_to_mvs_np(pmv, ft, nb)
                assert got[0] == ft
                np.testing.assert_array_equal(got[1], lmv, err_msg=line[:80])
                np.testing.assert_array_equal(got[2], lsp, err_msg=line[:80])
                np.testing.assert_array_equal(got[3], lsmv, err_msg=line[:80])


def test_read_bitstream_array_path_roundtrip(tmp_path):
    """File decode through the native parse path (FrameMVArrays /
    FrameResArrays interchange) reconstructs bit-exactly, twice over the
    same parsed stream (the merged-payload step must not mutate it)."""
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec

    from conftest import synthetic_clip

    clip = synthetic_clip(h=64, w=64, frames=4)
    cfg = CodecConfig(height=64, width=64, frames=4, search_range=2, qp=4,
                      intra_dur=2, vbs_enable=True, fme_enable=True, lam=0.02)
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode(package=False)
    mv_p, res_p = tmp_path / "mv.txt", tmp_path / "res.txt"
    BS.write_bitstream_arrays(mv_p, res_p, pkg["frame_type_seq"], pkg["per_frame"],
                              pkg["Qp_per_row_per_frame"], cfg)
    fts, mvs, qps, res = BS.read_bitstream(mv_p, res_p, cfg)
    assert all(isinstance(m, BS.FrameMVArrays) for m in mvs)
    assert all(isinstance(r, BS.FrameResArrays) for r in res)
    for _ in range(2):
        dec = codec.decode(fts, res, qps, mvs)
        np.testing.assert_array_equal(np.stack([np.asarray(f) for f in dec]),
                                      pkg["reconstructed frames"])


def test_transcode_read_write_identity(tmp_path):
    """read_bitstream (array interchange) -> write_bitstream must reproduce
    the original text files byte for byte (transcode identity: the
    differential chain reads only each block's chosen variant, which both
    interchange forms carry)."""
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec

    from conftest import synthetic_clip

    clip = synthetic_clip(h=64, w=64, frames=4)
    cfg = CodecConfig(height=64, width=64, frames=4, search_range=2, qp=4,
                      intra_dur=2, vbs_enable=True, lam=0.02)
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode(package=False)
    a_mv, a_res = tmp_path / "a.mv", tmp_path / "a.res"
    BS.write_bitstream_arrays(a_mv, a_res, pkg["frame_type_seq"], pkg["per_frame"],
                              pkg["Qp_per_row_per_frame"], cfg)
    fts, mvs, qps, res = BS.read_bitstream(a_mv, a_res, cfg)
    assert any(isinstance(m, BS.FrameMVArrays) for m in mvs)
    b_mv, b_res = tmp_path / "b.mv", tmp_path / "b.res"
    BS.write_bitstream(b_mv, b_res, fts, mvs, qps, res, cfg)
    assert a_mv.read_text() == b_mv.read_text()
    assert a_res.read_text() == b_res.read_text()
    # and the pure-Python list fallback serializes the same bytes
    mv_lists = [BS.mv_arrays_to_list(m) for m in mvs]
    c_mv, c_res = tmp_path / "c.mv", tmp_path / "c.res"
    BS.write_bitstream(c_mv, c_res, fts, mv_lists, qps, res, cfg)
    assert a_mv.read_text() == c_mv.read_text()


def test_write_bitstream_arrays_matches_list_path(tmp_path):
    """write_bitstream_arrays (device arrays + C++) produces byte-identical
    files to the list-based write_bitstream."""
    import jax

    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec

    from conftest import synthetic_clip

    clip = synthetic_clip(h=64, w=64, frames=3)
    cfg = CodecConfig(height=64, width=64, frames=3, search_range=2, qp=4, intra_dur=2, vbs_enable=True, lam=0.02)
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode(package=True)
    pkg2 = codec.encode(package=False)
    a_mv, a_res = tmp_path / "a.mv", tmp_path / "a.res"
    b_mv, b_res = tmp_path / "b.mv", tmp_path / "b.res"
    BS.write_bitstream(a_mv, a_res, pkg["frame_type_seq"], pkg["MVS per Frame"], pkg["Qp_per_row_per_frame"], pkg["approx residual"], cfg)
    BS.write_bitstream_arrays(b_mv, b_res, pkg2["frame_type_seq"], pkg2["per_frame"], pkg2["Qp_per_row_per_frame"], cfg)
    assert a_mv.read_text() == b_mv.read_text()
    assert a_res.read_text() == b_res.read_text()
