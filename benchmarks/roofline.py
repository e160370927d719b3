"""Roofline / efficiency accounting: every sweep row vs the CHIP, not Python.

Round-5 VERDICT item 2: all recorded numbers were ratios against a 0.12-2
fps Python encoder — a floor any vectorized program clears by 100x.  This
artifact grounds each `benchmarks/sweep_results.json` row against the
hardware's measured ceilings instead:

* ``peaks``   — four chained microprobes on the attached chip (the
  phase_probe2 discipline: everything inside ONE jitted fori_loop with a
  serial dependence, cost = (t(2n) - t(n)) / n, so the tunnel's ~30 ms sync
  floor and upload cancel):
    - ``mxu_bf16_tflops``: serial chained 2048^3 bf16 matmul (datasheet
      v5e ~197 TFLOP/s bf16);
    - ``vpu_int32_tops``: 192 chained elementwise int32 ops on a VMEM-scale
      block (the SAD arithmetic class);
    - ``hbm_gbps``: serial x = x + 1 over a 256 MB resident array
      (read + write, datasheet v5e ~819 GB/s);
    - ``fusion_latency_us``: serial (8, 128) no-op chain — the per-fusion
      floor that dominates small/sequential programs.
* ``rows``    — for each sweep row, the CLOSED-FORM work actually mandated
  by the codec config (derivations in _encode_model/_decode_model below):
  SAD lane-ops, DCT/quant MACs, and the algorithmic-minimum HBM bytes per
  frame.  Achieved rates = work / measured ms; each row is classified
  latency-, bandwidth-, or compute-bound by which ceiling-fraction
  dominates its frame time.

The work models are MINIMA (the useful math the algorithm requires — what a
perfect implementation would do), so ``pct_of_*`` is TRUE efficiency: time
the chip spent doing mandated work at peak rate / time it actually took.
The residual is dispatch latency, fusion overhead, gathers, and layout
traffic.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline.py [peaks|rows]

``rows`` reuses the recorded peaks block (no chip needed beyond the sweep).
Writes benchmarks/roofline.json.
"""
from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "benchmarks" / "roofline.json"


# --------------------------------------------------------------- peak probes
def measure_peaks():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_tpu")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def chained(body, init, n=8, reps=3):
        @functools.partial(jax.jit, static_argnums=0)
        def run(iters):
            return lax.fori_loop(0, iters, body, init)

        jax.block_until_ready(run(n))
        jax.block_until_ready(run(2 * n))

        def best(iters):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(run(iters))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(2 * n) - best(n)) / n

    peaks = {"device": str(jax.devices()[0])}

    # MXU: serial bf16 matmul chain — x = x @ B keeps a data dependence the
    # compiler cannot break; B has spectral radius ~1 so values stay finite.
    m = 2048
    key = jax.random.PRNGKey(0)
    b_mat = (jnp.eye(m) + 0.001 * jax.random.normal(key, (m, m))).astype(jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (m, m)).astype(jnp.bfloat16)
    per = chained(lambda _, x: (x @ b_mat), x0, n=64)
    peaks["mxu_bf16_tflops"] = round(2 * m**3 / per / 1e12, 1)
    peaks["mxu_probe_ms"] = round(per * 1e3, 4)

    # VPU int32: K chained 2-op (sub+abs) rounds on an 8 MB block; traffic is
    # 16 MB/iter vs 2*K*2M ops, compute-bound for K = 192 if VPU ~ O(1) TOPS.
    K = 192
    v0 = jnp.arange(2 * 1024 * 1024, dtype=jnp.int32).reshape(2048, 1024)

    def vpu_body(_, x):
        for c in (3, 5, 7, 11, 13, 17):
            for _ in range(K // 6):
                x = jnp.abs(x - c)
        return x

    per = chained(vpu_body, v0, n=8)
    k_eff = 6 * (K // 6)
    peaks["vpu_int32_tops"] = round(2 * k_eff * v0.size / per / 1e12, 2)
    peaks["vpu_probe_ms"] = round(per * 1e3, 4)

    # HBM: serial x = x + 1 over 256 MB (64M int32) — 512 MB traffic/iter.
    h0 = jnp.zeros((8192, 8192), jnp.int32)
    per = chained(lambda _, x: x + 1, h0, n=32)
    peaks["hbm_gbps"] = round(2 * h0.nbytes / per / 1e9, 1)
    peaks["hbm_probe_ms"] = round(per * 1e3, 4)

    # per-fusion latency floor: serial no-op-sized chain on one (8, 128) tile
    t0 = jnp.zeros((8, 128), jnp.int32)
    per = chained(lambda _, x: jnp.abs(x + 1), t0, n=4096)
    peaks["fusion_latency_us"] = round(per * 1e6, 3)
    return peaks


# --------------------------------------------------------------- work models
def _encode_model(h, w, sr, fme, vbs, nref, fast_me, gop, frames):
    """Mandated work per AVERAGE frame of the sweep's GOP mix (closed form).

    SAD lane-ops (int): the sub-block SAD maps touch every pixel once per
    candidate per reference (me.sad_maps): ops = 2 (abs-diff + add-tree) *
    h * w * ncand * nref, ncand = (2sr+1)^2 (sr is half-pel under FME —
    same count, me.py:225).  Fast-ME (Encoder.py:719-742 semantics) visits
    9 candidates per pass over ~3 chain passes + a 9-candidate confirm:
    ops = 2 * h * w * 9 * (passes + 1) * nref; VBS doubles the evaluated
    block classes on the same maps (quad sums are reused, +~1% — ignored).

    DCT MACs: 16-point separable DCT = 2 * 16^3 MACs/block forward, same
    inverse; VBS adds the 4x 8x8 quad transform (4 * 2 * 8^3 = half a full
    block) in BOTH directions; quant+dequant+RD ~ 10 ops/px (counted into
    vpu_ops).  Intra frames pay the same transform cost plus the
    prefix-sum search (~(sr+1) passes * 4 ops/px — minor, counted).

    HBM bytes (algorithmic minimum): read cur (1 B/px) + the reference
    planes once (FME: the (2h)(2w) upsampled planes, int16 as stored = 2
    B/px-of-plane) + write recon (1 B/px) + write int16 coefficients
    (2 B/px).  Window re-reads, intermediates, and layout copies are
    implementation overhead, deliberately NOT counted.
    """
    nb = (h // 16) * (w // 16)
    nd = 2 * sr + 1
    n_intra = max(1, frames // gop)
    inter_frac = (frames - n_intra) / frames

    if fast_me:
        sad_ops = 2 * h * w * 9 * 4 * nref
    else:
        sad_ops = 2 * h * w * nd * nd * nref
    sad_ops *= inter_frac  # intra frames run no search

    full_macs = 2 * 2 * 16**3  # fwd + inv, row+col passes
    quad_macs = 2 * 4 * 2 * 8**3 if vbs else 0
    dct_flops = 2 * nb * (full_macs + quad_macs)  # 2 FLOPs / MAC
    vpu_extra = 10 * h * w + (1 - inter_frac) * (sr + 1) * 4 * h * w

    plane_px = (2 * h) * (2 * w) if fme else h * w
    hbm = h * w * (1 + 1 + 2) + inter_frac * nref * plane_px * 2
    return {"sad_gops": sad_ops / 1e9, "dct_gflops": dct_flops / 1e9,
            "vpu_extra_gops": vpu_extra / 1e9, "min_hbm_mb": hbm / 1e6}


def _decode_model(h, w, vbs):
    """Decode: dequant + inverse DCT + MC add + wrap.  MACs = inverse halves
    of _encode_model's transform; fetch traffic = coefficients in (2 B/px) +
    prediction windows (1 B/px) + recon out (1 B/px)."""
    nb = (h // 16) * (w // 16)
    macs = nb * (2 * 16**3 + (4 * 2 * 8**3 if vbs else 0))
    return {"sad_gops": 0.0, "dct_gflops": 2 * macs / 1e9,
            "vpu_extra_gops": 6 * h * w / 1e9, "min_hbm_mb": 4 * h * w / 1e6}


# config mirror of benchmarks/sweep.py rows: (h, w, sr, fme, vbs, nref,
# fast_me, gop, frames) or decode (h, w, vbs)
_ENC = {
    "720p_full_search": (720, 1280, 8, False, False, 1, False, 8, 32),
    "720p_full_search_sr16": (720, 1280, 16, False, False, 1, False, 8, 32),
    "720p_vbs_fme": (720, 1280, 8, True, True, 1, False, 8, 32),
    "1080p_full_search": (1088, 1920, 8, False, False, 1, False, 8, 32),
    "1080p_vbs_fme": (1088, 1920, 8, True, True, 1, False, 8, 32),
    "4k_full_search": (2160, 3840, 8, False, False, 1, False, 8, 8),
    "4k_vbs_fme": (2160, 3840, 8, True, True, 1, False, 8, 8),
    "720p_fast_me": (720, 1280, 16, False, False, 1, True, 8, 32),
    "720p_fast_me_vbs_fme": (720, 1280, 16, True, True, 1, True, 8, 32),
    "720p_nref4": (720, 1280, 8, False, False, 4, False, 8, 32),
    "1080p_fast_me": (1088, 1920, 16, False, False, 1, True, 8, 32),
    "1080p_fast_me_vbs_fme": (1088, 1920, 16, True, True, 1, True, 8, 32),
    "4k_fast_me": (2160, 3840, 16, False, False, 1, True, 8, 8),
    "4k_fast_me_vbs_fme": (2160, 3840, 16, True, True, 1, True, 8, 8),
    "720p_rc_row_qp": (720, 1280, 8, False, False, 1, False, 8, 32),
    "720p_two_pass": (720, 1280, 8, False, False, 1, False, 8, 16),
    "cif_reference_defaults": (288, 352, 16, True, True, 1, True, 21, 21),
}
_DEC = {
    "720p_decode": (720, 1280, False),
    "720p_decode_pallas": (720, 1280, False),
    "720p_decode_vbs_fme": (720, 1280, True),
    "720p_decode_vbs_fme_pallas": (720, 1280, True),
    "1080p_decode_pallas": (1088, 1920, False),
    "1080p_decode_vbs_fme_pallas": (1088, 1920, True),
    "4k_decode_pallas": (2160, 3840, False),
    "4k_decode_vbs_fme_pallas": (2160, 3840, True),
}


def build_rows(peaks):
    sweep = json.loads((REPO / "benchmarks" / "sweep_results.json").read_text())
    vpu = peaks["vpu_int32_tops"] * 1e12
    mxu = peaks["mxu_bf16_tflops"] * 1e12
    hbm = peaks["hbm_gbps"] * 1e9
    rows = {}
    for name, rec in sweep.items():
        if not isinstance(rec, dict) or "fps" not in rec:
            continue
        if name in _ENC:
            model = _encode_model(*_ENC[name])
        elif name in _DEC:
            model = _decode_model(*_DEC[name])
        else:
            continue  # pipeline rows are link-bound by record, not modeled
        # two_pass runs the mandated encode work twice (the algorithm's cost)
        mult = 2.0 if name == "720p_two_pass" else 1.0
        t = 1.0 / rec["fps"]  # best-pass seconds/frame
        t_vpu = mult * (model["sad_gops"] + model["vpu_extra_gops"]) * 1e9 / vpu
        t_mxu = mult * model["dct_gflops"] * 1e9 / mxu
        t_hbm = mult * model["min_hbm_mb"] * 1e6 / hbm
        fr = {"compute_vpu": t_vpu / t, "compute_mxu": t_mxu / t,
              "bandwidth": t_hbm / t}
        bound = max(fr, key=fr.get)
        if fr[bound] < 0.33:
            bound = "latency/fusion"
        rows[name] = {
            "fps": rec["fps"], "ms_per_frame": round(1e3 * t, 2),
            **{k: round(v, 3) for k, v in model.items()},
            "pct_of_vpu": round(100 * fr["compute_vpu"], 1),
            "pct_of_mxu": round(100 * fr["compute_mxu"], 1),
            "pct_of_hbm": round(100 * fr["bandwidth"], 1),
            "bound": bound,
        }
    return rows


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    if mode in ("peaks", "all"):
        data["peaks"] = measure_peaks()
        print("peaks:", json.dumps(data["peaks"], indent=1), flush=True)
    if mode in ("rows", "all"):
        if "peaks" not in data:
            raise SystemExit("no recorded peaks — run `roofline.py peaks` on the chip first")
        data["rows"] = build_rows(data["peaks"])
        for n, r in data["rows"].items():
            print(f"{n:<28} {r['fps']:>7.1f} fps  vpu {r['pct_of_vpu']:5.1f}%  "
                  f"mxu {r['pct_of_mxu']:5.1f}%  hbm {r['pct_of_hbm']:5.1f}%  -> {r['bound']}",
                  flush=True)
    OUT.write_text(json.dumps(data, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
