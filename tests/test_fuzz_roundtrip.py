"""Randomized-config closed-loop fuzz: encode -> bitstream text -> parse ->
decode must reproduce the encoder's reconstructions bit-exactly for every
feature combination (the decoder.py:487-545 contract), and the package's
scalar metadata must survive the text round trip.

Seeded, so failures reproduce; dims stay small (CPU interpret for any
Pallas dispatch).
"""
import dataclasses
import os

import numpy as np
import pytest

from streamoptima_tpu import CodecConfig
from streamoptima_tpu import bitstream as BS
from streamoptima_tpu.jax_engine import JaxCodec

from conftest import synthetic_clip

TABLES = [[99000, 60000, 40000, 26000, 17000, 11000, 7200, 4800, 3200, 2100, 1400, 950],
          [60000, 36000, 24000, 16000, 10000, 6600, 4400, 2900, 1900, 1300, 850, 560]]


def _random_cfg(rng):
    h = int(rng.choice([32, 48, 64, 80]))
    w = int(rng.choice([32, 64, 96]))
    frames = int(rng.integers(3, 7))
    vbs = bool(rng.integers(0, 2))
    fme = bool(rng.integers(0, 2))
    rc = bool(rng.integers(0, 3) == 0)
    kw = dict(
        height=h, width=w, frames=frames,
        qp=int(rng.integers(0, 7)),
        intra_dur=int(rng.choice([2, 3, frames])),
        search_range=int(rng.choice([2, 4, 8])),
        vbs_enable=vbs, fme_enable=fme,
        fast_me=bool(rng.integers(0, 2)),
        n_ref_frames=int(rng.integers(1, 4)),
        me_search=str(rng.choice(["auto", "pallas", "fused", "materialized"])),
        engine="jax",
    )
    if vbs:
        kw["lam"] = float(rng.choice([0.0, 0.015, 0.3]))
    if rc:
        kw.update(rc_flag=1, target_br="480 kbps", frame_rate=30, qp_rate_tables=TABLES)
    return CodecConfig(**kw)


@pytest.mark.parametrize("seed", range(10))
def test_random_config_roundtrip(seed, tmp_path):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_cfg(rng)
    clip = synthetic_clip(cfg.height, cfg.width, cfg.frames,
                          motion=int(rng.integers(1, 4)), seed=seed)
    codec = JaxCodec(cfg, clip)
    pkg = codec.encode()

    mv_p, res_p = str(tmp_path / "mv.txt"), str(tmp_path / "res.txt")
    BS.write_bitstream(mv_p, res_p, pkg["frame_type_seq"], pkg["MVS per Frame"],
                       pkg["Qp_per_row_per_frame"], pkg["approx residual"], cfg)
    fts, mvs, qps, res = BS.read_bitstream(mv_p, res_p, cfg)
    assert fts == pkg["frame_type_seq"], cfg
    dec = codec.decode(fts, res, qps, mvs)
    for i, (d, r) in enumerate(zip(dec, pkg["reconstructed frames"])):
        np.testing.assert_array_equal(np.asarray(d), r, err_msg=f"seed {seed} frame {i} cfg {cfg}")
