"""RD mode decision + quantization, shared by the single-chip engine and the
multi-chip sharded encoder.

Twin of calculate_RD_cost (Encoder.py:1133-1158) applied per block: both the
full-block and the 4-quad (VBS) encodings are transformed once, their
entropy-coded bit counts estimated on device via vectorized RLE lengths, and
the split decision is ``lam * bits + MAE`` (quads quantized at QP-1,
Encoder.py:527 / 1293).  The RD decision uses the nominal QP while the final
coefficients are re-quantized at the (possibly per-row RC / per-block ROI)
QPs, matching the reference's flow order (RD inside *_prediction at the
nominal QP, Encoder.py:565; RC re-quantization afterwards, :1665-1697).
"""
from __future__ import annotations

import jax.numpy as jnp

from streamoptima_tpu.core.quant import quantize
from streamoptima_tpu.core.transform import dct2_int
from streamoptima_tpu.core.zigzag import rle_length


def qp_minus_1(qp):
    """Sub-block QP: QP-1 floored at 0 (Q vs Qm1, Encoder.py:57-59)."""
    return jnp.where(qp > 0, qp - 1, qp)


def transform_and_select(
    res_full,
    res_quads,
    sad_full,
    sad_quads,
    frame_type: int,
    qps_blocks,
    *,
    qp_nominal: int,
    lam,
    vbs_enable: bool,
    vbs_eligible,
    bs: int,
    sbs: int,
    ok_full=None,
    ok_quads=None,
):
    """DCT both variants once, RD-select, quantize at the per-block QPs.

    res_full: (nb, bs, bs) int32; res_quads: (nb, 4, sbs, sbs) int32;
    sad_full: (nb,) int32; sad_quads: (nb, 4) int32; qps_blocks: (nb,) int32.
    Returns (split (nb,) bool, qtc_full, qtc_quads, lens (nb,) int32 per-block
    entropy-coded lengths of the chosen variant, mae_per_block).  Frame size
    is ``lens.sum()``; per-row bits for RC stats are row-sums of ``lens``.

    Blocks without any valid search candidate carry MAE=+inf (reference
    semantics, Encoder.py:684): inf < inf is False, so an all-invalid block
    still SPLITS under VBS.
    """
    nb = res_full.shape[0]
    tf = dct2_int(res_full.astype(jnp.int32))  # (nb, bs, bs)
    qtc_const = quantize(tf, int(qp_nominal))
    split = jnp.zeros(nb, dtype=bool)
    tq = None
    mae_full = sad_full.astype(jnp.float32) / (bs * bs)
    if ok_full is not None:
        mae_full = jnp.where(ok_full, mae_full, jnp.inf)
    mae_pb = mae_full
    if vbs_enable:
        tq = dct2_int(res_quads.astype(jnp.int32))
        qtcq_const = quantize(tq, int(qp_nominal) - 1 if qp_nominal > 0 else int(qp_nominal))
        base = 8 if frame_type == 0 else 16
        base_v = 32 if frame_type == 0 else 64
        bits_bs = base + 8 * rle_length(qtc_const)
        bits_vbs = base_v + 8 * rle_length(qtcq_const).sum(axis=1)
        mae_q = sad_quads.astype(jnp.float32) / (sbs * sbs)
        if ok_quads is not None:
            mae_q = jnp.where(ok_quads, mae_q, jnp.inf)
        vbs_mae = mae_q.sum(axis=1) / 4.0
        rd_bs = lam * bits_bs.astype(jnp.float32) + mae_full
        rd_vbs = lam * bits_vbs.astype(jnp.float32) + vbs_mae
        split = ~(rd_bs < rd_vbs) & vbs_eligible
        mae_pb = jnp.where(vbs_eligible, vbs_mae, mae_full)
    qtc_full = quantize(tf, qps_blocks)
    lens_full = rle_length(qtc_full)
    if vbs_enable:
        qtc_quads = quantize(tq, qp_minus_1(qps_blocks)[:, None])
        lens_q = rle_length(qtc_quads).sum(axis=1)
        lens = jnp.where(split, lens_q, lens_full)
    else:
        qtc_quads = jnp.zeros((nb, 4, sbs, sbs), dtype=qtc_full.dtype)
        lens = lens_full
    return split, qtc_full, qtc_quads, lens, mae_pb
