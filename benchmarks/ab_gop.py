"""GOP-scan A/B: one sweep-style measurement per process, with kernel-policy
overrides, for perf attribution on the tunneled chip (the facade path's
per-frame syncs drown kernel differences; the single-device GOP scan is the
same program the sweep and bench.py time).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_gop.py \
        <h> <w> <frames> [vbs] [fme] [winner_fetch=auto] [ncol=0] [sr=8]

ncol=0 keeps the cost-based tiling; ncol=N monkeypatches me_pallas._col_tiles
to force N column tiles (band from the VMEM model at that width).
"""
import sys
import time

import jax

h, w, frames = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
vbs = "vbs" in sys.argv
fme = "fme" in sys.argv
fast_me = "fast_me" in sys.argv
fm_fetch = next((a.split("=")[1] for a in sys.argv if a.startswith("fm_fetch=")), "auto")
fm_look = next((a.split("=")[1] for a in sys.argv if a.startswith("fm_look=")), "auto")
fm_look = fm_look if fm_look == "auto" else int(fm_look)
wf = next((a.split("=")[1] for a in sys.argv if a.startswith("winner_fetch=")), "auto")
ncol = int(next((a.split("=")[1] for a in sys.argv if a.startswith("ncol=")), "0"))
agg = next((a.split("=")[1] for a in sys.argv if a.startswith("agg=")), "auto")
band_force = int(next((a.split("=")[1] for a in sys.argv if a.startswith("band=")), "0"))
sr = int(next((a.split("=")[1] for a in sys.argv if a.startswith("sr=")), "8"))

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.core import me_pallas
from streamoptima_tpu.parallel import ShardedCodec, make_mesh
from streamoptima_tpu.utils import synthetic_clip

me_pallas._AGG_ORDER = agg

if ncol:
    _orig = me_pallas._col_tiles

    def _forced(w_, nbr, bs, want_pred, want_qpred, nd, fme_k=True):
        band = band_force or me_pallas._band_rows(nbr, w_ // ncol, bs, want_pred,
                                                  want_qpred, nd, budget_mb=15.8,
                                                  fme=fme_k)
        return ncol, band

    me_pallas._col_tiles = _forced

cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                  intra_dur=8, search_range=sr, vbs_enable=vbs, fme_enable=fme,
                  winner_fetch=wf, me_search="pallas", fast_me=fast_me,
                  fast_me_fetch=fm_fetch, fast_me_lookahead=fm_look)
clip = synthetic_clip(h, w, frames)
mesh = make_mesh(cfg, devices=jax.devices()[:1])
codec = ShardedCodec(cfg, mesh, clip)
codec.encode(fetch="metrics")  # compile + warm
times = []
for _ in range(3):
    t0 = time.perf_counter()
    codec.encode(fetch="metrics")
    times.append(time.perf_counter() - t0)
best = frames / min(times)
mean = frames / (sum(times) / len(times))
print(f"AB {w}x{h} vbs={vbs} fme={fme} fast_me={fast_me} fm_fetch={fm_fetch} fm_look={fm_look} "
      f"wf={wf} ncol={ncol or 'auto'} sr={sr} agg={agg}: "
      f"best {best:.2f} fps mean {mean:.2f}", flush=True)
