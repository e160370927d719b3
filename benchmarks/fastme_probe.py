"""Per-phase timing of the fast-ME rowscan solve (tunnel-proof, see
phase_probe2.chain_time for the method).

Splits the fast-ME inter step into its measured parts so optimization
targets the real bottleneck:

* ``plane_stack``      — parity-plane build (FME) / cast (whole-pel)
* ``row_pass sweep``   — ONE chain sweep (the lax.scan over block columns;
                         the while_loop runs ~2 of these warm)
* ``window_gather nb`` — the confirm pass's all-blocks region fetch alone
* ``confirm``          — region fetch + 9-SAD + quads + winner predictions
* ``rowscan full``     — the production _fast_search_rowscan
* ``inter_step e2e``   — the full fast-ME inter step chained on its recon

Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/fastme_probe.py [720p|cif|all]
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


def probe(h, w, sr=16, vbs=True, fme=True):
    import dataclasses

    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.core import fastme as FM
    from streamoptima_tpu.jax_engine import JaxCodec
    from streamoptima_tpu.utils import synthetic_clip

    print(f"===== {w}x{h} fast_me sr={sr} vbs={vbs} fme={fme} =====", flush=True)
    frames = 4
    cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                      intra_dur=frames, search_range=sr, vbs_enable=vbs,
                      fme_enable=fme, fast_me=True, me_search="pallas")
    clip = synthetic_clip(h, w, frames)
    codec = JaxCodec(cfg, clip)

    refs = codec._y_dev[:1]
    cur_a = codec._y_dev[1].astype(jnp.int32)
    cur_b = codec._y_dev[2].astype(jnp.int32)
    n = codec.bs
    nbr, nbc, nb = codec.nbr, codec.nbc, codec.nb

    planes = FM.plane_stack(refs, fme, jnp, wrap_row_pass=True)
    jax.block_until_ready(planes)
    dims = (2 * h - 1, 2 * w - 1) if fme else (h, w)
    scale = 2 if fme else 1

    chain_time("plane_stack",
               lambda r: FM.plane_stack(r, fme, jnp, wrap_row_pass=True),
               refs, refs + 1)

    # one chain sweep: the scan over block columns at zero seeds
    ys = codec.by.reshape(nbr, nbc)[:, 0].astype(jnp.int32)
    xs = codec.bx.reshape(nbr, nbc)[0, :].astype(jnp.int32)
    Ys = ys * scale

    def one_sweep(c32):
        curT = codec._blockify(c32).reshape(nbr, nbc, n, n).swapaxes(0, 1)

        def step(g, inp):
            cb, x = inp
            xv = jnp.full((nbr,), x, jnp.int32)
            by0, bx0 = FM._region_base(g, ys, xv, n, fme, jnp)
            win = FM.window_gather(planes, by0, bx0, n + 2, jnp)
            mv, _ = FM.eval9(win, cb, g, xv * scale, Ys, n, dims, fme, None, jnp)
            return mv, mv

        _, mT = jax.lax.scan(step, jnp.zeros((nbr, 3), jnp.int32), (curT, xs))
        return mT

    chain_time("row_pass sweep", one_sweep, cur_a, cur_b, n=4)

    # confirm-phase pieces at a plausible converged MV field (zeros is the
    # cold seed; cost is MV-independent — shapes and selects are static)
    g_fin = jnp.zeros((nb, 3), jnp.int32)
    bx32 = codec.bx.astype(jnp.int32)
    by32 = codec.by.astype(jnp.int32)
    by0, bx0 = FM._region_base(g_fin, by32, bx32, n, fme, jnp)

    chain_time("window_gather nb",
               lambda p: FM.window_gather(p, by0, bx0, n + 2, jnp),
               planes, planes + 1, n=4)

    def confirm(c32):
        cur_bk = codec._blockify(c32)
        cur_q = codec._quads_of(cur_bk) if vbs else \
            jnp.zeros((nb, 4, codec.sbs, codec.sbs), jnp.int32)
        win = FM.window_gather(planes, by0, bx0, n + 2, jnp)
        return FM.confirm(win, cur_bk, cur_q, g_fin,
                          (codec.bx * scale).astype(jnp.int32),
                          (codec.by * scale).astype(jnp.int32),
                          n, codec.sbs, dims, fme, vbs, None, by0, bx0, jnp)

    chain_time("confirm", confirm, cur_a, cur_b, n=4)

    chain_time("rowscan full",
               lambda c: codec._fast_search_rowscan(c, refs, fme, False)["mv"],
               cur_a, cur_b, n=4)

    rqp = codec.row_qps_by_type[1]

    def full_step(r):
        out = codec._inter_step(codec._y_dev[1], r[None], rqp, codec._y_dev[1],
                                nref=1, initial_refs=False)
        return out["recon"]

    chain_time("inter_step e2e", full_step, codec._y_dev[0], codec._y_dev[2], n=4)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "720p"
    pp.ONLY = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("only=")), None)
    print("devices:", jax.devices(), flush=True)
    if which == "tiny":
        probe(64, 128)
    if which in ("cif", "all"):
        probe(288, 352, sr=16)
    if which in ("720p", "all"):
        probe(720, 1280, sr=16)
    if which == "1080p":
        probe(1088, 1920, sr=16)
    if which == "4k":
        probe(2160, 3840, sr=16)
    print("FASTME PROBE DONE", flush=True)
