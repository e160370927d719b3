"""Native-engine RD parity bounds vs the compat engine (== the reference).

The native engine's recorded deviations (COMPAT_NOTES.md N1-N3) must stay
RD-neutral where they claim to be, and RD-superior where they deviate on
purpose:

* Plain full-search configs: N1 (int32 DCT, values within +-1 of scipy) and
  N3 may move individual coefficients but not the operating point — mean
  PSNR within 0.1 dB and serialized bits within 1% of the reference across
  the QP range.
* fast-ME + VBS: the reference's quirk K6 (Encoder.py:742) makes its RD cost
  see mae=0 for fast-ME full blocks, so it structurally under-splits; the
  native engine (N2: true SADs) splits honestly — it may spend more bits,
  but must never lose PSNR.  The full-size recorded curve lives in
  benchmarks/rd_parity.json (benchmarks/rd_parity.py).

Bits are measured through the SAME serializer for both engines
(bitstream.py text grammar — the reference's own size notion).
"""
import dataclasses

import numpy as np
import pytest

from streamoptima_tpu import bitstream as BS
from streamoptima_tpu.compat_engine import CompatCodec
from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.jax_engine import JaxCodec

# NOT the conftest noise clip: its reconstruction PSNR sits at ~22 dB where
# uint8 WRAP events (the reference wraps, never clamps) turn +-1 near-tie
# coefficient differences into +-255 pixel errors — chaotic few-tenths-dB
# swings in either engine's favor that measure luck, not RD quality
from streamoptima_tpu.utils import synthetic_clip


def _bits_per_frame(pkg, cfg):
    total = 0
    for i in range(cfg.frames):
        total += len(BS.encode_mv_frame(
            pkg["frame_type_seq"][i], pkg["MVS per Frame"][i],
            pkg["Qp_per_row_per_frame"][i], cfg.rc_active, cfg.blocks_per_row))
        total += len(BS.encode_residual_frame(
            pkg["approx residual"][i], cfg.block_size, True))
    return 8.0 * total / cfg.frames


def _rd_point(cfg, clip):
    nat = JaxCodec(cfg, clip).encode()
    ccfg = dataclasses.replace(cfg, engine="compat")
    cmp_ = CompatCodec(ccfg, clip).encode()
    dpsnr = float(np.mean(nat["PSNR per frame"])) - float(np.mean(cmp_["PSNR per frame"]))
    nb, cb = _bits_per_frame(nat, cfg), _bits_per_frame(cmp_, ccfg)
    return dpsnr, (nb - cb) / cb


@pytest.mark.parametrize("qp", [1, 4, 7, 10])
def test_rd_parity_plain(qp):
    clip = synthetic_clip(64, 64, 4)
    cfg = CodecConfig(height=64, width=64, frames=4, block_size=16, qp=qp,
                      search_range=4, intra_dur=4)
    dpsnr, dbits = _rd_point(cfg, clip)
    assert abs(dpsnr) <= 0.1, f"plain qp={qp}: dPSNR {dpsnr:+.4f} dB"
    assert abs(dbits) <= 0.01, f"plain qp={qp}: dbits {100 * dbits:+.3f}%"


# Per-QP bits envelope, ~1.3x the measured deltas of THIS config (64x64
# sr4: round-5 measurement +8.1 / +13.9 / +53.9 / +56.6% at qp 1/4/7/10 —
# the tiny frame makes edge blocks ~7/16 of the grid, so the K6-fix's
# inf-forced honest splits weigh far more here than on the recorded CIF
# artifact, whose max is +18.3%).  A uniform 0.75 bound could hide a 4x
# regression at low QP (round-5 VERDICT item 4).
_FASTME_DBITS_MAX = {1: 0.11, 4: 0.18, 7: 0.70, 10: 0.74}


@pytest.mark.parametrize("qp", [1, 4, 7, 10])
def test_rd_parity_fast_me_vbs_fme(qp):
    clip = synthetic_clip(64, 64, 4)
    cfg = CodecConfig(height=64, width=64, frames=4, block_size=16, qp=qp,
                      search_range=4, intra_dur=4, fast_me=True,
                      vbs_enable=True, fme_enable=True, lam=0.015)
    dpsnr, dbits = _rd_point(cfg, clip)
    # K6-fix consequence: native may split (spend) more, but never lose PSNR
    assert dpsnr >= -0.01, f"fastme qp={qp}: native lost PSNR ({dpsnr:+.4f} dB)"
    assert dbits <= _FASTME_DBITS_MAX[qp], \
        f"fastme qp={qp}: dbits {100 * dbits:+.2f}% beyond recorded envelope"
