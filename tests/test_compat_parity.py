"""Full-pipeline bit-exact parity: CompatCodec vs the NumPy reference.

Runs both encoders on small synthetic clips across the feature matrix and
compares every output: frame types, MVs, quantized residuals, per-row QPs,
reconstructed frames, in-memory decode, and serialized bitstream text."""
import os

import numpy as np
import pytest

from streamoptima_tpu import bitstream as BS
from streamoptima_tpu.compat_engine import CompatCodec
from streamoptima_tpu.config import CodecConfig

import ref_subproc
from conftest import smooth_clip, synthetic_clip

TEST_TABLES = [
    [9000, 4000, 2000, 1100, 800, 600, 450, 350, 280, 230, 200, 180],  # intra
    [8000, 3500, 1800, 1000, 700, 500, 400, 300, 250, 210, 190, 170],  # inter (unused: quirk K9)
]

# (name, kwargs for both sides)
CONFIGS = [
    ("plain", dict()),
    ("vbs", dict(VBSEnable=True)),
    ("fme", dict(FMEEnable=True)),
    ("fastme", dict(fast_me=True)),
    ("fast_fme", dict(fast_me=True, FMEEnable=True)),
    ("vbs_fme_fast", dict(VBSEnable=True, FMEEnable=True, fast_me=True)),
    ("vbs_fme", dict(VBSEnable=True, FMEEnable=True)),
    ("rc1", dict(RCFlag=1, targetBR="150 kbps", qp_tables=TEST_TABLES)),
    ("rc1_vbs", dict(RCFlag=1, targetBR="100 kbps", qp_tables=TEST_TABLES, VBSEnable=True)),
    ("rc2_promote", dict(RCFlag=2, targetBR="150 kbps", qp_tables=TEST_TABLES, intra_thresh=100)),
    ("rc2_nopromote", dict(RCFlag=2, targetBR="150 kbps", qp_tables=TEST_TABLES, intra_thresh=10**7)),
    ("pmode1", dict(ParallelMode=1)),
    ("pmode2_fast", dict(ParallelMode=2, fast_me=True)),
    ("pmode2_vbs", dict(ParallelMode=2, VBSEnable=True)),
]


def run_reference(ref_modules, y, h, w, frames, tmp_path, **kwargs):
    """Reference oracle run.  ParallelMode != 0 executes in a clean
    subprocess: the reference forks multiprocessing workers internally
    (Encoder.py:484,:1255,:1816), and os.fork() from the multithreaded JAX
    test process risks a deadlock that would wedge the whole suite (144
    DeprecationWarnings per session before this)."""
    if kwargs.get("ParallelMode", 0) != 0:
        import pickle
        import subprocess
        import sys as _sys
        from pathlib import Path

        from conftest import REFERENCE

        args_p = os.path.join(tmp_path, "_ref_args.pkl")
        out_p = os.path.join(tmp_path, "_ref_out.pkl")
        payload = dict(kwargs, y=y, h=h, w=w, frames=frames, workdir=str(tmp_path),
                       reference_dir=str(REFERENCE))
        with open(args_p, "wb") as f:
            pickle.dump(payload, f)
        runner = Path(__file__).resolve().parent / "ref_subproc.py"
        subprocess.run([_sys.executable, str(runner), args_p, out_p], check=True)
        with open(out_p, "rb") as f:
            pkg, rec, decoded, mv_lines, res_lines = pickle.load(f)
        return None, pkg, rec, decoded, mv_lines, res_lines
    Encoder, _ = ref_modules
    pkg, rec, decoded, mv_lines, res_lines = ref_subproc.reference_encode_collect(
        Encoder, y, h, w, frames, str(tmp_path), **kwargs
    )
    return None, pkg, rec, decoded, mv_lines, res_lines


def run_compat(y, h, w, frames, qp=4, bs=16, sr=2, intra_dur=3, VBSEnable=False,
               FMEEnable=False, fast_me=False, RCFlag=None, targetBR=None,
               qp_tables=None, intra_thresh=None, ParallelMode=0):
    cfg = CodecConfig(
        height=h, width=w, frames=frames, block_size=bs, search_range=sr, qp=qp,
        intra_dur=intra_dur, intra_mode=0, lam=0.015, vbs_enable=VBSEnable,
        n_ref_frames=1, fast_me=fast_me, fme_enable=FMEEnable, rc_flag=RCFlag,
        target_br=targetBR, frame_rate=30, qp_rate_tables=qp_tables,
        intra_thresh=intra_thresh, parallel_mode=ParallelMode, engine="compat",
    )
    codec = CompatCodec(cfg, y)
    pkg = codec.encode()
    decoded = codec.decode(
        pkg["frame_type_seq"], pkg["approx residual"], pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"]
    )
    mv_lines = []
    res_lines = []
    for i in range(frames):
        mv_lines.append(
            str(pkg["frame_type_seq"][i]) + "|" + BS.encode_mv_frame(
                pkg["frame_type_seq"][i], pkg["MVS per Frame"][i], pkg["Qp_per_row_per_frame"][i],
                cfg.rc_active, cfg.blocks_per_row,
            )
        )
        res_lines.append(BS.encode_residual_frame(pkg["approx residual"][i], bs, True))
    return cfg, codec, pkg, decoded, mv_lines, res_lines


def assert_packages_equal(ref_pkg, ref_rec, ref_dec, ref_mv, ref_res, pkg, decoded, mv_lines, res_lines, frames):
    assert list(ref_pkg["frame_type_seq"]) == list(pkg["frame_type_seq"])
    for i in range(frames):
        assert [int(q) for q in ref_pkg["Qp_per_row_per_frame"][i]] == [int(q) for q in pkg["Qp_per_row_per_frame"][i]], i
        rmv = ref_pkg["MVS per Frame"][i]
        cmv = pkg["MVS per Frame"][i]
        assert len(rmv) == len(cmv)
        for j, (a, b) in enumerate(zip(rmv, cmv)):
            assert a[0] == b[0], (i, j, a, b)
            if a[0] == 0:
                assert tuple(np.atleast_1d(a[1])) == tuple(np.atleast_1d(b[1])), (i, j, a, b)
            else:
                assert [tuple(np.atleast_1d(x)) for x in a[1]] == [tuple(np.atleast_1d(x)) for x in b[1]], (i, j)
        rres = ref_pkg["approx residual"][i]
        cres = pkg["approx residual"][i]
        for j, (a, b) in enumerate(zip(rres, cres)):
            assert a[0] == b[0], (i, j)
            if a[0] == 0:
                assert np.array_equal(np.asarray(a[1]), np.asarray(b[1])), (i, j)
            else:
                for q in range(4):
                    assert np.array_equal(np.asarray(a[1][q]), np.asarray(b[1][q])), (i, j, q)
        assert np.array_equal(ref_rec[i], pkg["reconstructed frames"][i]), i
        assert np.array_equal(np.asarray(ref_dec[i], dtype=np.uint8), decoded[i]), i
        assert ref_mv[i] == mv_lines[i], i
        assert ref_res[i] == res_lines[i], i
        assert ref_pkg["MAE per Frame"][i] == pkg["MAE per Frame"][i], i
        assert ref_pkg["PSNR per frame"][i] == pytest.approx(pkg["PSNR per frame"][i], abs=1e-9), i


@pytest.mark.parametrize("name,flags", CONFIGS)
@pytest.mark.parametrize("clip", ["noise", "smooth"])
def test_parity(ref_modules, tmp_path, name, flags, clip):
    h, w, frames = 64, 64, 3
    y = synthetic_clip(h, w, frames) if clip == "noise" else smooth_clip(h, w, frames)
    _, ref_pkg, ref_rec, ref_dec, ref_mv, ref_res = run_reference(ref_modules, y, h, w, frames, tmp_path, **flags)
    _, _, pkg, decoded, mv_lines, res_lines = run_compat(y, h, w, frames, **flags)
    assert_packages_equal(ref_pkg, ref_rec, ref_dec, ref_mv, ref_res, pkg, decoded, mv_lines, res_lines, frames)


def test_bitstream_roundtrip(tmp_path):
    h, w, frames = 64, 64, 3
    y = synthetic_clip(h, w, frames)
    cfg, codec, pkg, decoded, mv_lines, res_lines = run_compat(y, h, w, frames, VBSEnable=True, FMEEnable=True)
    mv_p = tmp_path / "mv.txt"
    res_p = tmp_path / "res.txt"
    BS.write_bitstream(mv_p, res_p, pkg["frame_type_seq"], pkg["MVS per Frame"],
                       pkg["Qp_per_row_per_frame"], pkg["approx residual"], cfg)
    fts, mvs, qps, residuals = BS.read_bitstream(mv_p, res_p, cfg)
    assert fts == list(pkg["frame_type_seq"])
    dec2 = codec.decode(fts, residuals, qps, mvs)
    for i in range(frames):
        assert np.array_equal(dec2[i], decoded[i]), i
