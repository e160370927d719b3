"""Round-5 probe: where does the 4K fast-ME SWEEP ROW spend its frame time?

`4k_fast_me_vbs_fme` records ~100 ms/frame while the chained inter step
measures ~63 ms — the gap (1 intra frame + GOP-scan dispatch + drain per
8-frame batch) is the OTHER half of the 20-fps budget and was never split.
Measures, on the sweep's own ShardedCodec program:

* ``encode_j dispatch``  — one full 8-frame GOP batch dispatch, best-of
                           (includes the ~30 ms tunnel sync ONCE)
* ``encode() wall``      — the sweep row's own protocol (upload staged)
* ``inter_step e2e``     — JaxCodec chained inter step (the known ~63 ms)
* ``intra_step e2e``     — JaxCodec chained intra step (never measured at
                           4K; 12.8 ms at 720p => ~115 ms if it scales by px)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/gopsplit_probe.py [4k|1080p]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

import benchmarks.phase_probe2 as pp  # noqa: F401  (jax cache config)
from benchmarks.phase_probe2 import chain_time


def probe(h, w):
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec
    from streamoptima_tpu.parallel import ShardedCodec, make_mesh
    from streamoptima_tpu.utils import synthetic_clip

    frames = 8
    cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                      intra_dur=8, search_range=16, vbs_enable=True,
                      fme_enable=True, fast_me=True, lam=0.015)
    clip = synthetic_clip(h, w, frames)
    print(f"===== {w}x{h} fast_me sr=16 vbs fme (sweep-row config) =====", flush=True)

    codec = ShardedCodec(cfg, make_mesh(cfg, devices=jax.devices()[:1]), clip)
    warm = jnp.asarray(clip[None, : cfg.intra_dur])
    jax.block_until_ready(codec._encode_j(warm, codec._row_qps, codec._roi))
    codec.encode(fetch="metrics")  # stage frames + warm drain path

    def best(name, fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(jax.tree.leaves(out))
            ts.append(time.perf_counter() - t0)
        b, m = min(ts), sum(ts) / len(ts)
        print(f"{name:<24} best {1e3 * b:8.1f} ms  mean {1e3 * m:8.1f} ms", flush=True)
        return b

    t_disp = best("encode_j dispatch", lambda: codec._encode_j(
        codec._frames_dev[:1], codec._row_qps, codec._roi))
    t_wall = best("encode() wall", lambda: codec.encode(fetch="metrics"))

    jcodec = JaxCodec(cfg, clip)
    rqp1 = jcodec.row_qps_by_type[1]
    rqp0 = jcodec.row_qps_by_type[0]

    def inter_step(r):
        out = jcodec._inter_step(jcodec._y_dev[1], r[None], rqp1, jcodec._y_dev[1],
                                 nref=1, initial_refs=False)
        return out["recon"]

    t_inter = chain_time("inter_step e2e", inter_step, jcodec._y_dev[0],
                         jcodec._y_dev[2], n=4)

    def intra_step(c):
        return jcodec._intra_step(c, rqp0, c)["recon"]

    t_intra = chain_time("intra_step e2e", intra_step, jcodec._y_dev[0],
                         jcodec._y_dev[1], n=4)

    if t_inter and t_intra:
        acc = 7 * t_inter + t_intra
        print(f"steps account for {1e3 * acc:.1f} ms of the {1e3 * t_wall:.1f} ms wall "
              f"({1e3 * (t_wall - acc):.1f} ms = dispatch + drain + scan overhead)",
              flush=True)

    # the single-chip engine's own wall (per-frame async dispatches, no mesh
    # collectives): is the residual overhead the mesh program's or the GOP
    # batching's?
    jcodec.encode(package=False)  # warm
    best("JaxCodec encode wall", lambda: jcodec.encode(package=False))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "4k"
    print("devices:", jax.devices(), flush=True)
    if which in ("1080p", "all"):
        probe(1088, 1920)
    if which in ("4k", "all"):
        probe(2160, 3840)
    print("GOPSPLIT PROBE DONE", flush=True)
