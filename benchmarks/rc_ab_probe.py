"""Isolate the sweep's RC-active anomaly (140 vs 234 fps at 720p).

rc_flag=1 row QPs are static per frame type (rc.row_qp_sequence: the
reference's budget recursion carries TABLE values, not actual bits), so the
RC-active GOP scan is the SAME compiled executable as the plain row — only
the row-QP VALUES differ.  This times the same jitted program on the same
codec object under three row-QP inputs (plain qp=4, RC-picked qp=8, qp=8
everywhere) to separate data-dependent effects (tunnel compression of the
fetched metrics, if any) from sweep-protocol variance.

    python benchmarks/rc_ab_probe.py
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_tpu")
    except Exception:
        pass

    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.parallel import ShardedCodec, make_mesh
    from streamoptima_tpu.utils import synthetic_clip

    frames_n = 32
    cfg = CodecConfig(height=720, width=1280, search_range=8, frames=frames_n,
                      block_size=16, qp=4, intra_dur=8, lam=0.015)
    clip = synthetic_clip(720, 1280, frames_n)
    codec = ShardedCodec(cfg, make_mesh(cfg, devices=jax.devices()[:1]), clip)
    codec.encode(fetch="metrics")  # warm compile + clip upload

    def timed(row_qps, label, n=4):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            sl = codec._frames_dev[: codec.ndata]
            out = codec._encode_j(sl, row_qps, codec._roi)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        gl = codec.gl * codec.ndata
        print(f"{label}: best {gl/min(ts):7.2f} fps  all "
              f"{[round(gl/t, 1) for t in ts]}", flush=True)

    qp4 = jnp.asarray(np.full((2, codec.nbr), 4, np.int32))
    qp8 = jnp.asarray(np.full((2, codec.nbr), 8, np.int32))
    qp0 = jnp.asarray(np.full((2, codec.nbr), 0, np.int32))
    mix = jnp.asarray(np.stack([np.arange(codec.nbr) % 12] * 2).astype(np.int32))
    for _ in range(2):
        timed(qp4, "row QPs = 4 (plain)  ")
        timed(qp8, "row QPs = 8 (RC pick)")
        timed(qp0, "row QPs = 0          ")
        timed(mix, "row QPs = 0..11 mixed")


if __name__ == "__main__":
    main()
