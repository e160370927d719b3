"""Compile-only scoped-VMEM probe for the Pallas search kernel.

For each (w, h, ncol, band, pred, qpred) class this forces the band/tile
selection and AOT-compiles the search kernel on the chip's remote compile
service.  A Mosaic scoped-VMEM OOM reports the EXACT attempted allocation
size, so every failure is a calibration point for ``me_pallas._band_rows``
and every success is a proven-safe selection.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/vmem_probe.py

Results print one line per probe: ``w=.. ncol=.. band=.. pred/qpred -> OK``
or ``OOM scoped=<bytes>``.  Compiles are cached in
/tmp/jax_compile_cache_tpu, so re-runs are cheap.
"""
import re
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from streamoptima_tpu.core import me_pallas as MP


def probe(h, w, ncol, band, pred, qpred, sr=8, fme=True):
    h = -(-h // 16) * 16  # the engine pads to a block multiple
    orig = MP._col_tiles
    MP._col_tiles = lambda *a, **k: (ncol, band)
    # jit caches lowering by (shapes, statics); the forced band is neither,
    # so without this every probe after the first per class is a cached lie
    jax.clear_caches()
    try:
        cur = jnp.zeros((h, w), jnp.int32)
        refs = jnp.zeros((1, h, w), jnp.uint8)
        fn = MP.full_search_pallas_fme if fme else MP.full_search_pallas
        lowered = fn.lower(cur, refs, sr=sr, bs=16, sub_bs=8, vbs=qpred,
                           want_pred=pred)
        lowered.compile()
        return "OK", None
    except Exception as e:  # noqa: BLE001 — we want the OOM text
        m = re.search(r"size ([0-9.]+)M and limit ([0-9.]+)M", str(e))
        if m:
            return "OOM", float(m.group(1))
        return "ERR", str(e)[:300]
    finally:
        MP._col_tiles = orig


def main():
    print("devices:", jax.devices(), flush=True)
    cases = [
        # (label, h, w, ncol, bands DESCENDING (first OK = max), pred, qpred, fme, sr)
        ("4K argmin nc2 fme", 2160, 3840, 2, (20, 18, 17), False, False, True, 8),
        ("1080p argmin fme", 1080, 1920, 1, (23, 20, 16), False, False, True, 8),
        ("1080p qpred fme", 1080, 1920, 1, (9, 8, 7, 6), True, True, True, 8),
        ("1080p pred fme", 1080, 1920, 1, (10, 9), True, False, True, 8),
        ("4K pred nc2", 2160, 3840, 2, (10,), True, False, False, 8),
        ("4K qpred nc3 fme", 2160, 3840, 3, (11, 10), True, True, True, 8),
        ("720p qpred sr16", 720, 1280, 1, (8, 7, 6), True, True, True, 16),
        ("720p argmin sr16", 720, 1280, 1, (16, 12), False, False, True, 16),
        # round-4 closure of the supported-matrix gaps (VERDICT r3 item 6):
        # sr=16 classes at 1080p/4K and the remaining production selections
        ("1080p pred sr16", 1080, 1920, 1, (8, 7, 6, 5, 4), True, False, True, 16),
        ("1080p qpred sr16", 1080, 1920, 1, (6, 5, 4, 3), True, True, True, 16),
        ("1080p argmin sr16", 1080, 1920, 1, (16, 14, 12, 10), False, False, True, 16),
        ("4K pred nc2 sr16", 2160, 3840, 2, (7, 6, 5, 4), True, False, True, 16),
        ("4K qpred nc2 sr16", 2160, 3840, 2, (6, 5, 4, 3), True, True, True, 16),
        ("4K argmin nc2 sr16", 2160, 3840, 2, (18, 16, 14, 12), False, False, True, 16),
        ("4K qpred nc2 fme", 2160, 3840, 2, (9, 8, 7, 6), True, True, True, 8),
        ("720p pred sr16 fme", 720, 1280, 1, (11, 10, 9, 8, 7), True, False, True, 16),
        # the two sr=16 selections _col_tiles still takes from the model
        ("1080p qpred nc3 sr16", 1080, 1920, 3, (11, 10, 9, 8), True, True, True, 16),
        ("4K pred nc5 sr16", 2160, 3840, 5, (9, 8, 7, 6), True, False, False, 16),
    ]
    for label, h, w, ncol, bands, pred, qpred, fme, sr in cases:
        for band in bands:
            st, extra = probe(h, w, ncol, band, pred, qpred, sr=sr, fme=fme)
            print(f"{label:<18} w={w} ncol={ncol} band={band:2d} "
                  f"pred={int(pred)} qpred={int(qpred)} fme={int(fme)} sr={sr} -> {st}"
                  + (f" scoped={extra}M" if st == "OOM" else "")
                  + (f" {extra}" if st == "ERR" else ""), flush=True)
            if st == "OK":
                break  # descending: first OK is the class max


if __name__ == "__main__":
    sys.exit(main())
