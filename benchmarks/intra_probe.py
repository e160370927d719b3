"""Round-5 probe: what makes the 4K intra step 200 ms?

benchmarks/gopsplit_probe.py measured the sweep-row 4K fast-ME budget as
7 x 63 ms inter + 201 ms intra + 154 ms scan/dispatch per 8-frame batch —
the intra step is the SECOND-largest term and was last split at 720p
(search 3.66 + reconstruct 3.63 + transform/RD ~5 of 12.8 ms, ROUND4.md).
This splits it at any size:

* ``search``        — intra_search_mode0 (prefix sums + masked argmin)
* ``residuals``     — intra_residuals_mode0 (shift-select band)
* ``transform_rd``  — _transform_and_select at frame type 0
* ``reconstruct``   — _recon_intra (dequant + IDCT + wavefront scan)
* ``intra_step e2e``— the full chained step

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/intra_probe.py [4k|1080p|720p]
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

import benchmarks.phase_probe2 as pp
from benchmarks.phase_probe2 import chain_time


def probe(h, w, sr=16, vbs=True):
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.core import intra as I
    from streamoptima_tpu.jax_engine import JaxCodec
    from streamoptima_tpu.utils import synthetic_clip

    print(f"===== {w}x{h} intra sr={sr} vbs={vbs} =====", flush=True)
    frames = 3
    cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                      intra_dur=1, search_range=sr, vbs_enable=vbs,
                      fme_enable=vbs, fast_me=True, lam=0.015)
    clip = synthetic_clip(h, w, frames)
    codec = JaxCodec(cfg, clip)
    cur_a = codec._y_dev[0].astype(jnp.int32)
    cur_b = codec._y_dev[1].astype(jnp.int32)
    rqp0 = codec.row_qps_by_type[0]
    canvas_w = cfg.intra_canvas[1]
    bs = codec.bs

    chain_time("search", lambda c: I.intra_search_mode0(c, bs, sr, canvas_w, vbs, jnp),
               cur_a, cur_b, n=8)

    out = I.intra_search_mode0(cur_a, bs, sr, canvas_w, vbs, jnp)
    jax.block_until_ready(out)

    def resid_all(c):
        f, q = I.intra_residuals_mode0(c, out["mv"], out.get("sub_mv"), bs, jnp, sr=sr)
        return (f, q) if q is not None else f

    chain_time("residuals", resid_all, cur_a, cur_b, n=8)

    res_full, res_quads = I.intra_residuals_mode0(cur_a, out["mv"], out.get("sub_mv"),
                                                  bs, jnp, sr=sr)
    if res_quads is None:
        res_quads = jnp.zeros((codec.nb, 4, codec.sbs, codec.sbs), jnp.int32)
    sub_sad = (out["sub_sad"].reshape(codec.nb, 4) if vbs
               else jnp.zeros((codec.nb, 4), jnp.int32))
    smv3 = (out["sub_mv"].reshape(codec.nb, 4) if vbs
            else jnp.zeros((codec.nb, 4), jnp.int32))

    chain_time("transform_rd",
               lambda r: codec._transform_and_select(r, res_quads,
                                                     out["sad"].reshape(-1),
                                                     sub_sad, 0, rqp0),
               res_full, -res_full, n=8)

    split, qtc_full, qtc_quads, lens, mae = codec._transform_and_select(
        res_full, res_quads, out["sad"].reshape(-1), sub_sad, 0, rqp0)
    jax.block_until_ready((split, qtc_full))

    chain_time("reconstruct",
               lambda q: codec._recon_intra(out["mv"].reshape(-1), split, smv3,
                                            q, qtc_quads, rqp0),
               qtc_full, -qtc_full, n=4)

    def intra_step(c):
        return codec._intra_step(c, rqp0, c)["recon"]

    chain_time("intra_step e2e", intra_step, codec._y_dev[0], codec._y_dev[1], n=4)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "4k"
    print("devices:", jax.devices(), flush=True)
    if which in ("720p", "all"):
        probe(720, 1280)
    if which in ("1080p", "all"):
        probe(1088, 1920)
    if which in ("4k", "all"):
        probe(2160, 3840)
    print("INTRA PROBE DONE", flush=True)
