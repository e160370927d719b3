"""Run the upstream reference encoder and collect its outputs.

Importable both from the test process (in-process oracle runs) and as a
standalone script (``python ref_subproc.py args.pkl out.pkl``) for the
ParallelMode cases: the reference's own ParallelMode 1/2 forks worker
processes via ``multiprocessing`` (Encoder.py:484,:1255,:1816), and forking
from the multithreaded JAX test process risks a deadlock that would wedge
the whole parity suite — a clean subprocess (no JAX import anywhere on this
module's path) makes the oracle robust.
"""
from __future__ import annotations

import os
import pickle
import sys
from pathlib import Path


def reference_encode_collect(Encoder, y, h, w, frames, workdir, qp=4, bs=16, sr=2,
                             intra_dur=3, VBSEnable=False, FMEEnable=False,
                             fast_me=False, RCFlag=None, targetBR=None,
                             qp_tables=None, intra_thresh=None, ParallelMode=0):
    """Encode ``y`` with the reference and return
    (pkg, rec, decoded, mv_lines, res_lines) — everything the parity
    assertions consume (the Encoder object itself stays in this process)."""
    import numpy as np

    cwd = os.getcwd()
    os.chdir(workdir)
    os.makedirs("yuv", exist_ok=True)
    os.makedirs("files", exist_ok=True)
    try:
        enc = Encoder.Y_Video_codec(
            h, w, frames, block_size=bs, search_range=sr, Qp=qp, intra_dur=intra_dur,
            intra_mode=0, lam=0.015, VBSEnable=VBSEnable, nRefFrames=1,
            y_only_frame_arr=y, fast_me=fast_me, FMEEnable=FMEEnable, RCFlag=RCFlag,
            targetBR=targetBR, frame_rate=30, qp_rate_tables=qp_tables,
            intra_thresh=intra_thresh, ParallelMode=ParallelMode,
        )
        enc.encode(block_size=bs)
        pkg = enc.encoded_package
        rec = np.fromfile("yuv/y_only_reconstructed.yuv", dtype=np.uint8).reshape(frames, h, w)
        decoded = enc.decoder.decode(
            pkg["frame_type_seq"], pkg["approx residual"], pkg["Qp_per_row_per_frame"],
            pkg["MVS per Frame"], 0, intra_dur, bs, frames, w, h,
        )
        mv_lines = []
        res_lines = []
        for i in range(frames):
            mv_lines.append(
                str(pkg["frame_type_seq"][i]) + "|" + enc.differential_encoder_frame(
                    pkg["frame_type_seq"][i], pkg["MVS per Frame"][i], pkg["Qp_per_row_per_frame"][i]
                )
            )
            res_lines.append(enc.entropy_encoder_frame(pkg["approx residual"][i], bs))
        return pkg, rec, decoded, mv_lines, res_lines
    finally:
        os.chdir(cwd)


def _main(args_path: str, out_path: str) -> None:
    with open(args_path, "rb") as f:
        payload = pickle.load(f)
    shim = str(Path(__file__).resolve().parent / "ref_shims")
    for p in (shim, payload.pop("reference_dir")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import Encoder  # noqa: E402  (the upstream reference)

    out = reference_encode_collect(Encoder, **payload)
    with open(out_path, "wb") as f:
        pickle.dump(out, f)


if __name__ == "__main__":
    _main(sys.argv[1], sys.argv[2])
