"""Measure the NumPy reference encoder's throughput (the bench.py baseline).

The reference publishes no numbers (BASELINE.md), so the baseline is
established by running it here and recording the result in
``benchmarks/reference_baseline.json``:

- **CIF full encode** (352x288): the reference's own end-to-end path
  (intra + inter frames), IPPP full-search config (BASELINE.json config #2:
  block 16, search range +-8).
- **720p inter frame** (1280x720): the reference *cannot* encode 720p
  end-to-end — its intra path hardcodes a 288x352 search canvas
  (Encoder.py:1248, :1165) and crashes/garbage-indexes beyond CIF — so the
  720p baseline times ``complete_inter_flow`` (the P-frame hot path,
  Encoder.py:1644) directly, which is dimension-clean.  An IPPP GOP is
  (intra_dur-1)/intra_dur inter frames, so this flatters the reference if
  anything (its intra path is slower per frame than inter at CIF).

Run:  python benchmarks/measure_reference.py  (takes minutes; CPU only)
"""
from __future__ import annotations

import json
import os
import platform
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("STREAMOPTIMA_REFERENCE", "/root/reference"))

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests" / "ref_shims"))  # skimage stand-in
sys.path.insert(0, str(REFERENCE))

from streamoptima_tpu.utils import synthetic_clip  # noqa: E402

BS, SR, QP, INTRA_DUR = 16, 8, 4, 8  # BASELINE.json config #2


def make_encoder(Encoder, h, w, frames, y):
    return Encoder.Y_Video_codec(
        h, w, frames, block_size=BS, search_range=SR, Qp=QP, intra_dur=INTRA_DUR,
        intra_mode=0, lam=0.015, VBSEnable=False, nRefFrames=1,
        y_only_frame_arr=y, fast_me=False, FMEEnable=False, RCFlag=None,
        targetBR=None, frame_rate=30, qp_rate_tables=None,
        intra_thresh=None, ParallelMode=0,
    )


def main():
    import Encoder  # the reference

    out = {
        "config": {"block_size": BS, "search_range": SR, "qp": QP, "intra_dur": INTRA_DUR,
                   "vbs": False, "fme": False, "fast_me": False, "clip": "synthetic_clip(seed=42, motion=2)"},
        "host": platform.platform(),
        "cpu": platform.processor() or "unknown",
    }

    # --- CIF end-to-end ---------------------------------------------------
    h, w, frames = 288, 352, 8
    clip = synthetic_clip(h, w, frames)
    os.makedirs("/tmp/refbench/yuv", exist_ok=True)
    cwd = os.getcwd()
    os.chdir("/tmp/refbench")
    try:
        enc = make_encoder(Encoder, h, w, frames, clip)
        t0 = time.perf_counter()
        enc.encode(block_size=BS)
        cif_s = time.perf_counter() - t0
    finally:
        os.chdir(cwd)
    out["cif"] = {"h": h, "w": w, "frames": frames, "seconds": cif_s, "fps": frames / cif_s}
    print(f"[ref] CIF {frames} frames: {cif_s:.1f}s = {frames / cif_s:.4f} fps", flush=True)

    # --- 720p inter frames ------------------------------------------------
    h, w = 720, 1280
    clip = synthetic_clip(h, w, 3)
    enc = make_encoder(Encoder, h, w, 3, clip)
    ref = [clip[0]]
    times = []
    for i in (1, 2):
        t0 = time.perf_counter()
        enc.complete_inter_flow(clip[i], ref, BS, SR)
        times.append(time.perf_counter() - t0)
        print(f"[ref] 720p inter frame {i}: {times[-1]:.1f}s", flush=True)
    sec = sum(times) / len(times)
    out["p720_inter"] = {"h": h, "w": w, "sec_per_frame": sec, "fps": 1.0 / sec}

    path = REPO / "benchmarks" / "reference_baseline.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
