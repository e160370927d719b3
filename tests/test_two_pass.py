"""Two-pass rate control (BASELINE.json config #4; README.md:13 promise).

Pass 1 encodes with the standard RC row QPs and gathers per-row bit shares
(the stats the reference computes then discards, Encoder.py:1627-1639);
pass 2 reallocates the frame budget by those shares and re-encodes.
"""
import numpy as np
import pytest

from streamoptima_tpu import rc
from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.jax_engine import JaxCodec

from conftest import synthetic_clip

TABLES = [
    [9000, 4000, 2000, 1100, 800, 600, 450, 350, 280, 230, 200, 180],
    [8000, 3500, 1800, 1000, 700, 500, 400, 300, 250, 210, 190, 170],
]


def _cfg(**kw):
    base = dict(
        height=64, width=64, frames=4, block_size=16, search_range=4, qp=4,
        intra_dur=2, rc_flag=1, target_br="150 kbps", frame_rate=30,
        qp_rate_tables=TABLES,
    )
    base.update(kw)
    return CodecConfig(**base)


def test_two_pass_round_trips():
    clip = synthetic_clip(h=64, w=64, frames=4, motion=2)
    cfg = _cfg(two_pass=True)
    pkg = JaxCodec(cfg, clip).encode()
    # per-frame QP rows recorded and non-empty
    assert all(len(q) == 4 for q in pkg["Qp_per_row_per_frame"])
    # decode with the transmitted per-row QPs reproduces the reconstruction
    dec = JaxCodec(cfg)
    frames = dec.decode(
        pkg["frame_type_seq"], pkg["approx residual"], pkg["Qp_per_row_per_frame"], pkg["MVS per Frame"]
    )
    np.testing.assert_array_equal(np.stack(frames), pkg["reconstructed frames"])


def test_two_pass_differs_from_single_pass():
    """The reallocated QPs actually respond to content: with a busy top half
    and a flat bottom half, pass-2 gives the busy rows a larger budget share
    (lower QP) than the flat rows — the single-pass row QPs are
    content-independent (quirk K10) and cannot do this."""
    rng = np.random.default_rng(5)
    clip = np.zeros((4, 64, 64), dtype=np.uint8)
    clip[:, :32] = rng.integers(0, 256, size=(4, 32, 64))  # busy top
    clip[:, 32:] = 128  # flat bottom
    one = JaxCodec(_cfg(target_br="80 kbps"), clip).encode()
    two = JaxCodec(_cfg(target_br="80 kbps", two_pass=True), clip).encode()
    assert two["Qp_per_row_per_frame"] != one["Qp_per_row_per_frame"]
    # busy rows get a QP <= flat rows' QP in every two-pass frame
    for qps in two["Qp_per_row_per_frame"]:
        assert qps[0] <= qps[3]
    assert any(qps[0] < qps[3] for qps in two["Qp_per_row_per_frame"])


def test_two_pass_budget_allocation_math():
    cfg = _cfg(two_pass=True)
    stats = np.array([50.0, 25.0, 12.5, 12.5])
    budgets = rc.two_pass_row_budgets(cfg, stats)
    frame_budget = cfg.target_bitrate // cfg.frame_rate
    np.testing.assert_allclose(budgets.sum(), frame_budget)
    np.testing.assert_allclose(budgets[0] / budgets[1], 2.0)
    qps = rc.row_qp_from_budgets(cfg, budgets, frame_type=1)
    assert len(qps) == 4
    # bigger budget -> lower (or equal) QP
    assert qps[0] <= qps[1] <= qps[2]


def test_two_pass_requires_rc():
    with pytest.raises(ValueError):
        CodecConfig(height=64, width=64, frames=2, two_pass=True)
    with pytest.raises(ValueError):
        CodecConfig(height=64, width=64, frames=2, two_pass=True, engine="compat",
                    rc_flag=1, target_br="100 kbps", qp_rate_tables=TABLES)


def test_native_rc_uses_per_type_tables():
    """K9 fix: the native engine looks inter frames up in the *inter* table
    (the reference passes frame_type 0 everywhere, Encoder.py:1671, which the
    compat engine replicates)."""
    clip = synthetic_clip(h=64, w=64, frames=4, motion=2)
    cfg = _cfg()
    pkg = JaxCodec(cfg, clip).encode()
    seq_intra = rc.row_qp_sequence(cfg, 0)
    seq_inter = rc.row_qp_sequence(cfg, 1)
    assert seq_intra != seq_inter  # tables differ enough to observe the fix
    for ft, qps in zip(pkg["frame_type_seq"], pkg["Qp_per_row_per_frame"]):
        assert qps == (seq_intra if ft == 0 else seq_inter)
