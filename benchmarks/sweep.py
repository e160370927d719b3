"""Benchmark sweep: encode/decode throughput across configurations.

Beyond bench.py's single headline number, this measures the feature matrix
on the attached device and writes ``benchmarks/sweep_results.json``:

- 720p IPPP full search (the headline config)
- 720p with VBS + FME (flagship feature set, half-pel search range doubled)
- 1080p IPPP full search (scaling headroom)
- CIF with the reference's own default config (sr 16, VBS+FME)
- 720p decode throughput
- multi-chip GOP/tile mesh scaling (if >1 device)

Run:  python benchmarks/sweep.py   (uses whatever jax.devices() offers)
"""
from __future__ import annotations

import json
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
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec
    from streamoptima_tpu.parallel import ShardedCodec, make_mesh
    from streamoptima_tpu.utils import synthetic_clip

    results = {"device": str(jax.devices()[0]), "n_devices": len(jax.devices())}

    def gop_encode_fps(name, cfg, frames_n=32):
        clip = synthetic_clip(cfg.height, cfg.width, frames_n)
        import dataclasses

        cfg = dataclasses.replace(cfg, frames=frames_n)
        mesh = make_mesh(cfg, devices=jax.devices()[:1])
        codec = ShardedCodec(cfg, mesh, clip)
        warm = jnp.asarray(clip[None, : cfg.intra_dur])
        jax.block_until_ready(codec._encode_j(warm, codec._row_qps, codec._roi))
        t0 = time.perf_counter()
        pkg = codec.encode(fetch="metrics")
        el = time.perf_counter() - t0
        results[name] = {
            "fps": round(frames_n / el, 2),
            "mean_psnr_db": round(float(np.mean(pkg["PSNR per frame"])), 2),
            "config": f"{cfg.width}x{cfg.height} sr={cfg.search_range} vbs={cfg.vbs_enable} fme={cfg.fme_enable} gop={cfg.intra_dur}",
        }
        print(name, results[name], flush=True)

    base = dict(frames=32, block_size=16, qp=4, intra_dur=8, lam=0.015)
    gop_encode_fps("720p_full_search", CodecConfig(height=720, width=1280, search_range=8, **base))
    gop_encode_fps("720p_vbs_fme", CodecConfig(height=720, width=1280, search_range=8,
                                               vbs_enable=True, fme_enable=True, **base))
    gop_encode_fps("1080p_full_search", CodecConfig(height=1088, width=1920, search_range=8, **base))
    gop_encode_fps("4k_full_search", CodecConfig(height=2160, width=3840, search_range=8, **base), frames_n=8)
    gop_encode_fps("cif_reference_defaults", CodecConfig(height=288, width=352, search_range=16,
                                                         vbs_enable=True, fme_enable=True, **base))

    # decode throughput (720p): jitted decode steps over an encoded clip
    cfg = CodecConfig(height=720, width=1280, search_range=8, **base)
    clip = synthetic_clip(720, 1280, 8)
    codec = JaxCodec(cfg, clip)
    cur = codec._y_dev[1]
    refs = codec._y_dev[:1]
    enc = codec._inter_step_j(cur, refs, codec.row_qps, cur, nref=1, initial_refs=False)
    dec = lambda: codec._dec_inter_j(  # noqa: E731
        refs, enc["mv"], enc["split"], enc["sub_mv"], enc["qtc_full"], enc["qtc_quads"],
        codec.row_qps, nref=1, initial_refs=False,
    )
    jax.block_until_ready(dec())
    t0 = time.perf_counter()
    for _ in range(32):
        out = dec()
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / 32
    results["720p_decode"] = {"fps": round(1.0 / el, 1), "ms_per_frame": round(el * 1e3, 2)}
    print("720p_decode", results["720p_decode"], flush=True)

    if len(jax.devices()) > 1:
        import dataclasses

        cfg = dataclasses.replace(CodecConfig(height=720, width=1280, search_range=8, **base), frames=32)
        clipm = synthetic_clip(720, 1280, 32)
        mesh = make_mesh(cfg)
        codecm = ShardedCodec(cfg, mesh, clipm)
        t0 = time.perf_counter()
        codecm.encode(fetch="metrics")
        el = time.perf_counter() - t0
        results["720p_mesh_all_devices"] = {
            "fps": round(32 / el, 2),
            "mesh": f"data={mesh.devices.shape[0]} tile={mesh.devices.shape[1]}",
        }
        print("720p_mesh_all_devices", results["720p_mesh_all_devices"], flush=True)

    out_path = REPO / "benchmarks" / "sweep_results.json"
    out_path.write_text(json.dumps(results, indent=2) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
