"""Round-5 VERDICT item 3: pin the 720p Pallas decode best-pass variance.

Round 3 recorded 658 fps best for `720p_decode_pallas`; round 4 recorded
397-421 on an UNCHANGED program and left it "observed but not chased".
This runs the sweep's decode protocol (one unrecorded warmup pass + >= 5
steady passes, chained inputs) in N SEPARATE PROCESSES (fresh tunnel
sessions) and records every per-pass time, so the cross-session spread is
a recorded artifact the next drift can cite.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/decode_var.py [sessions]

Writes benchmarks/decode_var.json.
"""
from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.jax_engine import JaxCodec
from streamoptima_tpu.utils import synthetic_clip

h, w, frames = 720, 1280, 8
cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                  intra_dur=8, search_range=8, lam=0.015, me_search="pallas")
clip = synthetic_clip(h, w, frames)
codec = JaxCodec(cfg, clip)
cur = codec._y_dev[1]
refs = codec._y_dev[:1]
enc = codec._inter_step_j(cur, refs, codec.row_qps, cur, nref=1, initial_refs=False)
tab = codec._fetch_table(enc["mv"], enc["sub_mv"])
assert tab is not None

def dec(r):
    return codec._dec_inter_pallas_j(
        r, enc["mv"], enc["split"], enc["sub_mv"], enc["qtc_full"],
        enc["qtc_quads"], codec.row_qps, tab, nref=1, initial_refs=False)

jax.block_until_ready(dec(refs))

def one_pass():
    t0 = time.perf_counter()
    out = refs
    for _ in range(32):
        out = dec(out)[None]
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 32

warm = one_pass()
els = [one_pass() for _ in range(7)]
print("RESULT " + json.dumps({"warmup_ms": round(1e3 * warm, 2),
                              "pass_ms": [round(1e3 * e, 2) for e in els]}))
"""


def main():
    sessions = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {"sessions": []}
    for i in range(sessions):
        r = subprocess.run([sys.executable, "-c", CHILD], capture_output=True,
                           text=True, timeout=1800)
        line = next((ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")), None)
        if line is None:
            print(f"session {i}: FAILED\n{r.stdout[-800:]}\n{r.stderr[-800:]}")
            continue
        rec = json.loads(line[len("RESULT "):])
        rec["best_fps"] = round(1e3 / min(rec["pass_ms"]), 1)
        rec["mean_fps"] = round(1e3 * len(rec["pass_ms"]) / sum(rec["pass_ms"]), 1)
        out["sessions"].append(rec)
        print(f"session {i}: {rec}", flush=True)
    if out["sessions"]:
        bests = [s["best_fps"] for s in out["sessions"]]
        out["cross_session_best_spread_pct"] = round(
            100 * (max(bests) - min(bests)) / max(bests), 1)
    (REPO / "benchmarks" / "decode_var.json").write_text(json.dumps(out, indent=1))
    print("wrote benchmarks/decode_var.json")


if __name__ == "__main__":
    main()
