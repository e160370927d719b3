"""A/B the rowscan lookahead (cfg.fast_me_lookahead) on the chip.

The speculative multi-column chain step resolves k columns per lax.scan step
from one wide window per segment (core/fastme.eval_chain); every k is
bit-identical.  This probe times ONE chain sweep and the full production
solve per k so "auto" is a measured rule.

Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/lookahead_ab.py [720p|cif|all]
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


def probe(h, w, sr=16, vbs=True, fme=True, ks=(1, 2, 4, 8, "auto")):
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec
    from streamoptima_tpu.utils import synthetic_clip

    print(f"===== {w}x{h} fast_me sr={sr} vbs={vbs} fme={fme} =====", flush=True)
    frames = 4
    clip = synthetic_clip(h, w, frames)
    base_mv = None
    for k in ks:
        cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                          intra_dur=frames, search_range=sr, vbs_enable=vbs,
                          fme_enable=fme, fast_me=True, me_search="pallas",
                          fast_me_lookahead=k)
        codec = JaxCodec(cfg, clip)
        keff = codec._fast_me_lookahead(codec.nbc, codec.nbr)
        refs = codec._y_dev[:1]
        cur_a = codec._y_dev[1].astype(jnp.int32)
        cur_b = codec._y_dev[2].astype(jnp.int32)

        mv = np.asarray(codec._fast_search_rowscan(cur_a, refs, fme, False)["mv"])
        if base_mv is None:
            base_mv = mv
        tag = "OK " if np.array_equal(mv, base_mv) else "MISMATCH"
        print(f"  k={k} (eff {keff}) parity vs k=1: {tag}", flush=True)

        chain_time(f"rowscan full k={k} (eff {keff})",
                   lambda c: codec._fast_search_rowscan(c, refs, fme, False)["mv"],
                   cur_a, cur_b, n=4)

        rqp = codec.row_qps_by_type[1]

        def full_step(r):
            out = codec._inter_step(codec._y_dev[1], r[None], rqp, codec._y_dev[1],
                                    nref=1, initial_refs=False)
            return out["recon"]

        chain_time(f"inter_step e2e k={k}", full_step, codec._y_dev[0],
                   codec._y_dev[2], n=4)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "720p"
    pp.ONLY = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("only=")), None)
    print("devices:", jax.devices(), flush=True)
    if which == "tiny":
        probe(64, 128, sr=4, ks=(1, 2, "auto"))
    if which in ("cif", "all"):
        probe(288, 352, sr=16, ks=(1, 2, 4, 8, 11, "auto"))
    if which in ("720p", "all"):
        probe(720, 1280, sr=16, ks=(1, 2, 4, 6, 8, "auto"))
    print("LOOKAHEAD AB DONE", flush=True)
