"""Round-5 probe: where does two-pass spend its extra ~19%?

Recorded: 720p_two_pass 133.7 fps vs 318.0 single-pass RC — 2.38x cost where
two encode passes inherently cost 2.0x.  This decomposes one encode() into
its three parts, timed separately on the chip:

* ``pass1``  — _first_pass_rqps minus the host realloc (the GOP scan at the
               table QPs + the row-bits drain)
* ``realloc`` — the host rc.second_pass_row_qps loops + the rqp upload
* ``pass2``  — _run_scan_batches with per-frame QPs (_encode2_j)
* ``single`` — _run_scan_batches with type QPs (the 1-pass program), for the
               program-vs-program comparison (is the per-frame-QP program
               itself slower than the type-QP program?)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/twopass_probe.py
"""
from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from streamoptima_tpu import rc as rc_mod
from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.parallel import ShardedCodec, make_mesh
from streamoptima_tpu.utils import synthetic_clip


def main():
    frames = 16
    rc_tables = [[2e5, 1.2e5, 8e4, 5e4, 3e4, 2e4, 1.2e4, 8e3, 5e3, 3e3, 2e3, 1.2e3]] * 2
    cfg = CodecConfig(height=720, width=1280, frames=frames, block_size=16, qp=4,
                      intra_dur=8, search_range=8, lam=0.015, rc_flag=1,
                      target_br="8 mbps", frame_rate=30, qp_rate_tables=rc_tables,
                      two_pass=True)
    clip = synthetic_clip(720, 1280, frames)
    codec = ShardedCodec(cfg, make_mesh(cfg, devices=jax.devices()[:1]), clip)
    codec.encode(fetch="metrics")  # warm both programs + stage frames

    n_gops = math.ceil(frames / codec.gl)
    g_pad = math.ceil(n_gops / codec.ndata) * codec.ndata
    codec._stage_frames(g_pad)

    def timeit(name, fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(jax.tree.leaves(out)) if out is not None else None
            ts.append(time.perf_counter() - t0)
        best, mean = min(ts), sum(ts) / len(ts)
        print(f"{name:<26} best {1e3 * best:8.2f} ms  mean {1e3 * mean:8.2f} ms  "
              f"({frames / best:6.1f} fps-equiv)", flush=True)
        return best

    # pass 1 without the realloc: the scan + row-bits drain only
    def pass1_scan():
        rbs = []
        for b in range(g_pad // codec.ndata):
            o = codec._encode_j(
                codec._frames_dev[b * codec.ndata : (b + 1) * codec.ndata],
                codec._row_qps, codec._roi)
            rb = o["row_bits"]
            rb.copy_to_host_async()
            rbs.append(rb)
        return np.concatenate([np.asarray(r) for r in rbs], axis=0)

    row_bits = pass1_scan()
    t_p1 = timeit("pass1 scan+drain", pass1_scan)

    type_rows = np.asarray(codec._row_qps)

    def realloc():
        out = np.empty((g_pad, codec.gl, codec.nbr), np.int32)
        for g in range(g_pad):
            for f in range(codec.gl):
                ft = 0 if f == 0 else 1
                out[g, f] = rc_mod.second_pass_row_qps(cfg, row_bits[g, f], ft, type_rows[ft])
        return jax.device_put(jnp.asarray(out))

    rqp_dev = realloc()
    t_re = timeit("host realloc + upload", realloc)

    def pass2():
        return codec._run_scan_batches(g_pad, "metrics", np.asarray(rqp_dev))

    t_p2 = timeit("pass2 scan (per-frame QP)", pass2)

    def single():
        return codec._run_scan_batches(g_pad, "metrics", None)

    t_s = timeit("single-pass scan (type QP)", single)

    def full():
        return codec.encode(fetch="metrics")

    t_f = timeit("encode() end to end", full)

    print(f"\nsum of parts {1e3 * (t_p1 + t_re + t_p2):.1f} ms vs e2e {1e3 * t_f:.1f} ms; "
          f"2x single = {2e3 * t_s:.1f} ms; pass2/single program ratio "
          f"{t_p2 / t_s:.3f}", flush=True)
    print("TWOPASS PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
