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
