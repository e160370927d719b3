"""On-chip kernel smoke: compile + bit-parity of the supported Pallas shape
classes vs the XLA kernels on the REAL chip (interpret mode validates values
but not Mosaic constraints — docs/TPU_DESIGN.md), plus quick A/B timings for
the winner_fetch policy.  Run after any kernel or band-model change:

    python benchmarks/smoke_chip.py
"""
import time, dataclasses, sys
import numpy as np
import jax

from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.jax_engine import JaxCodec
from streamoptima_tpu.utils import synthetic_clip

base = dict(frames=8, block_size=16, qp=4, intra_dur=8, n_ref_frames=1)


def enc(cfg, clip):
    c = JaxCodec(cfg, clip)
    p = c.encode(package=False)
    return c, p


def parity(name, h, w, sr, vbs, fme):
    clip = synthetic_clip(h, w, 8)
    cfg = CodecConfig(height=h, width=w, search_range=sr, vbs_enable=vbs,
                      fme_enable=fme, me_search="pallas", **base)
    cfg2 = dataclasses.replace(cfg, me_search="fused")
    t0 = time.perf_counter()
    _, p1 = enc(cfg, clip)
    t1 = time.perf_counter()
    _, p2 = enc(cfg2, clip)
    r1 = np.asarray(p1["reconstructed frames"])
    r2 = np.asarray(p2["reconstructed frames"])
    ok = np.array_equal(r1, r2)
    print(f"{name}: parity={'OK' if ok else 'MISMATCH'} compile+run {t1-t0:.1f}s",
          flush=True)
    if not ok:
        print("  max diff", np.abs(r1.astype(int) - r2.astype(int)).max())
        sys.exit(1)


def timed(name, cfg, frames_n=16):
    cfg = dataclasses.replace(cfg, frames=frames_n)
    clip = synthetic_clip(cfg.height, cfg.width, frames_n)
    codec = JaxCodec(cfg, clip)
    codec.encode(package=False)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        codec.encode(package=False)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: best {frames_n/min(ts):.2f} fps mean {frames_n/(sum(ts)/len(ts)):.2f}",
          flush=True)


print("devices:", jax.devices(), flush=True)
# ---- Mosaic compile + parity of the NEW tiled shapes (vs fused XLA)
parity("720p plain ncol2", 720, 1280, 8, False, False)
parity("720p vbs+fme ncol2", 720, 1280, 8, True, True)
parity("4k plain ncol6", 2160, 3840, 8, False, False)
parity("4k vbs+fme ncol6", 2160, 3840, 8, True, True)

# ---- timings: auto policy + tiling
timed("720p_full_auto(inkernel)", CodecConfig(height=720, width=1280, search_range=8,
                                              me_search="pallas", **base), 32)
timed("720p_full_fetch", CodecConfig(height=720, width=1280, search_range=8,
                                     me_search="pallas", winner_fetch="fetch", **base), 32)
timed("720p_vbsfme_auto(fetch)", CodecConfig(height=720, width=1280, search_range=8,
                                             vbs_enable=True, fme_enable=True,
                                             me_search="pallas", **base), 32)
timed("720p_vbsfme_inkernel", CodecConfig(height=720, width=1280, search_range=8,
                                          vbs_enable=True, fme_enable=True,
                                          me_search="pallas", winner_fetch="inkernel", **base), 32)
timed("4k_full_auto", CodecConfig(height=2160, width=3840, search_range=8,
                                  me_search="pallas", **base), 8)
timed("4k_vbsfme_auto", CodecConfig(height=2160, width=3840, search_range=8,
                                    vbs_enable=True, fme_enable=True,
                                    me_search="pallas", **base), 8)
timed("4k_vbsfme_inkernel", CodecConfig(height=2160, width=3840, search_range=8,
                                        vbs_enable=True, fme_enable=True,
                                        me_search="pallas", winner_fetch="inkernel", **base), 8)
timed("4k_full_fetch", CodecConfig(height=2160, width=3840, search_range=8,
                                   me_search="pallas", winner_fetch="fetch", **base), 8)
# the round-3 sweep measured RC-active plain encode at 140 fps vs 234 plain
# (same shapes, same kernels — only the QP VALUES differ): isolate
rc_tables = [[2e5, 1.2e5, 8e4, 5e4, 3e4, 2e4, 1.2e4, 8e3, 5e3, 3e3, 2e3, 1.2e3]] * 2
timed("720p_rc_active", CodecConfig(height=720, width=1280, search_range=8,
                                    rc_flag=1, target_br="8 mbps", frame_rate=30,
                                    qp_rate_tables=rc_tables, me_search="pallas", **base), 32)

# ---- WIDE fetch-decode Mosaic smoke: a fast-ME stream whose MVP chain
# walks beyond search_range engages the wide plane pad (pad=32+) and the
# barrel-shift column path — interpret mode validated VALUES only
print("wide fetch decode smoke:", flush=True)
pan, h, w, fr = 8, 256, 1280, 6
ys = np.arange(h + pan * fr)
sheet = np.clip(128 + 100 * np.sin(2 * np.pi * ys / 32.0)[:, None]
                + np.random.default_rng(0).integers(-8, 9, (h + pan * fr, w)), 0, 255
                ).astype(np.uint8)
clip = np.stack([sheet[i * pan : i * pan + h] for i in range(fr)])
cfgw = CodecConfig(height=h, width=w, frames=fr, block_size=16, qp=3, intra_dur=fr,
                   search_range=2, fast_me=True, me_search="pallas")
cw = JaxCodec(cfgw, clip)
pw = cw.encode()
dec = cw.decode(pw["frame_type_seq"], pw["approx residual"],
                pw["Qp_per_row_per_frame"], pw["MVS per Frame"])
ok = all(np.array_equal(np.asarray(d), r)
         for d, r in zip(dec, pw["reconstructed frames"]))
print(f"wide decode: {'OK' if ok else 'MISMATCH'}", flush=True)
if not ok:
    sys.exit(1)
print("ALL DONE", flush=True)
