"""Round-5 probe: the wide-window Pallas fetch vs the clamped-slice gather.

The round-4 cost model (docs/ROUND4.md "4K fast-ME cost model") pinned the
4K fast-ME solve as SLICE-GATHER-LATENCY bound: 135 segments x ~2.1 us x
~180 steps*passes ~= 51 ms of a ~62 ms step.  me_pallas.window_fetch now
serves the lookahead chain step's RECTANGULAR wide windows with an 8-deep
DMA pipeline; this probe measures, per shape (1080p / 4K FME VBS production
configs):

* AOT compile of the standalone fetch FIRST (the round-3 de-risk: a wedged
  scan-chained kernel must be caught before it is chained);
* ``fetch S wide``   — one scan step's window fetch alone, slice vs pallas;
* ``sweep step``     — fetch + eval_chain (the real scan body), both modes;
* ``rowscan full``   — the production solve under both fetch modes.

Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/winfetch_probe.py [1080p|4k|720p|all]
"""
from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

import benchmarks.phase_probe2 as pp
from benchmarks.phase_probe2 import chain_time


def probe(h, w, sr=16, vbs=True, fme=True, modes=("slice", "pallas")):
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.core import fastme as FM
    from streamoptima_tpu.jax_engine import JaxCodec
    from streamoptima_tpu.utils import synthetic_clip

    print(f"===== {w}x{h} fast_me sr={sr} vbs={vbs} fme={fme} =====", flush=True)
    frames = 4
    cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                      intra_dur=frames, search_range=sr, vbs_enable=vbs,
                      fme_enable=fme, fast_me=True, me_search="pallas")
    clip = synthetic_clip(h, w, frames)
    codec = JaxCodec(cfg, clip)

    refs = codec._y_dev[:1]
    cur_a = codec._y_dev[1].astype(jnp.int32)
    cur_b = codec._y_dev[2].astype(jnp.int32)
    n = codec.bs
    nbr, nbc = codec.nbr, codec.nbc
    S, L = nbr, nbc
    kl = codec._fast_me_lookahead(L, S, fme)
    wr, wc = FM.wide_window_spec(n, kl, fme)
    print(f"segments S={S}, steps/pass={-(-L // kl)}, lookahead k={kl}, "
          f"wide window {wr}x{wc}", flush=True)

    planes = FM.plane_stack(refs, fme, jnp, wrap_row_pass=True)
    jax.block_until_ready(planes)
    dims = (2 * h - 1, 2 * w - 1) if fme else (h, w)
    scale = 2 if fme else 1

    ys = codec.by.reshape(nbr, nbc)[:, 0].astype(jnp.int32)
    # a representative step's origins: mid-frame column, zero MVs
    g0 = jnp.zeros((S, 3), jnp.int32)
    xv0 = jnp.full((S,), (nbc // 2) * n, jnp.int32)
    by0, bx0 = FM._wide_base(g0, ys, xv0, kl, fme, jnp)

    preps = {}
    for mode in modes:
        preps[mode] = FM.window_prep(planes, n + 2, mode, wide=(wr, wc))

    # ---- de-risk: AOT-compile the standalone pallas fetch before chaining
    if "pallas" in modes:
        t0 = time.time()
        f = jax.jit(lambda y, x: FM.window_read(preps["pallas"], y, x, wr, jnp,
                                                nwin_c=wc))
        f.lower(by0, bx0).compile()
        print(f"pallas fetch standalone compile OK ({time.time() - t0:.1f}s)",
              flush=True)

    for mode in modes:
        prep = preps[mode]
        chain_time(f"fetch S wide [{mode}]",
                   lambda o, prep=prep: FM.window_read(prep, o[0], o[1], wr, jnp,
                                                       nwin_c=wc),
                   (by0, bx0), (by0 + 1, bx0 + 1), n=16)

    # eval_chain ALONE (fixed wide windows as the chained input): splits the
    # sweep step into fetch vs eval so the pass cost model has two pinned
    # terms instead of one residual
    wide0 = FM.window_read(preps[modes[0]], by0, bx0, wr, jnp, nwin_c=wc)
    curs0 = codec._blockify(cur_a).reshape(S, L, n, n).swapaxes(0, 1)[:kl]
    xv0K = jnp.broadcast_to(xv0, (kl, S))
    cmask = jnp.ones((kl,), bool)
    chain_time("eval_chain only",
               lambda wv: FM.eval_chain(wv, curs0, g0, xv0K, ys, n, kl, dims,
                                        fme, None, cmask, jnp),
               wide0, wide0 + 1, n=16)

    # one full sweep pass (scan over columns, fetch + eval_chain) per mode
    Lp = -(-L // kl)
    padc = Lp * kl - L
    xsT = codec.bx.astype(jnp.int32).reshape(S, L).swapaxes(0, 1)
    cmK = jnp.asarray((np.arange(Lp * kl) < L).reshape(Lp, kl))
    xsK = (jnp.concatenate([xsT, jnp.broadcast_to(xsT[-1:], (padc, S))])
           if padc else xsT).reshape(Lp, kl, S)

    def one_pass(c32, prep):
        curT = codec._blockify(c32).reshape(S, L, n, n).swapaxes(0, 1)
        curK = (jnp.concatenate([curT, jnp.zeros((padc,) + curT.shape[1:], curT.dtype)])
                if padc else curT).reshape(Lp, kl, S, n, n)

        def step(g, inp):
            cb, xv, cm = inp
            b_y, b_x = FM._wide_base(g, ys, xv[0], kl, fme, jnp)
            wide = FM.window_read(prep, b_y, b_x, wr, jnp, nwin_c=wc)
            mvs = FM.eval_chain(wide, cb, g, xv, ys, n, kl, dims, fme, None, cm, jnp)
            return mvs[-1], mvs[-1]

        _, mT = jax.lax.scan(step, g0, (curK, xsK, cmK))
        return mT

    for mode in modes:
        chain_time(f"row_pass sweep [{mode}]",
                   lambda c, prep=preps[mode]: one_pass(c, prep), cur_a, cur_b, n=4)

    # whole-pass kernel (me_pallas.rowscan_pass): AOT de-risk compile, the
    # standalone pass, then the full production solve under the kernel
    if "kernel" in modes or True:
        from streamoptima_tpu.core import me_pallas as MP

        pk_prep = MP.pass_prep(planes, wr, wc, fme)
        curKk = (jnp.concatenate([codec._blockify(cur_a).reshape(S, L, n, n)
                                  .swapaxes(0, 1),
                                  jnp.zeros((padc, S, n, n), jnp.int32)])
                 if padc else
                 codec._blockify(cur_a).reshape(S, L, n, n).swapaxes(0, 1)
                 ).reshape(Lp, kl, S, n, n).astype(jnp.int16)
        if fme:
            curKk = jnp.repeat(curKk, 4, axis=-1)
        cmKi = cmK.astype(jnp.int32)
        xs0 = xsK[:, 0, :].reshape(-1)
        import time as _t

        t0 = _t.time()
        f = jax.jit(lambda s: MP.rowscan_pass(pk_prep, curKk, xs0, xsK, ys,
                                              cmKi, s, n, kl, dims)[0])
        f.lower(g0).compile()
        print(f"kernel pass standalone compile OK ({_t.time() - t0:.1f}s)",
              flush=True)
        chain_time("row_pass sweep [kernel]",
                   lambda s: MP.rowscan_pass(pk_prep, curKk, xs0, xsK, ys,
                                             cmKi, s, n, kl, dims)[0][-1, -1],
                   g0, g0 + 1, n=4)

    for mode in modes:
        c2 = JaxCodec(dataclasses.replace(cfg, fast_me_fetch=mode,
                                          fast_me_pass="xla"), clip)
        chain_time(f"rowscan full [{mode}]",
                   lambda c, c2=c2: c2._fast_search_rowscan(c, refs, fme, False)["mv"],
                   cur_a, cur_b, n=4)
    c3 = JaxCodec(dataclasses.replace(cfg, fast_me_pass="kernel"), clip)
    chain_time("rowscan full [kernel]",
               lambda c: c3._fast_search_rowscan(c, refs, fme, False)["mv"],
               cur_a, cur_b, n=4)
    # on-chip bit parity: kernel solve vs the slice-fetch XLA solve
    c4 = JaxCodec(dataclasses.replace(cfg, fast_me_fetch="slice",
                                      fast_me_pass="xla"), clip)
    mv_k = np.asarray(c3._fast_search_rowscan(cur_a, refs, fme, False)["mv"])
    mv_x = np.asarray(c4._fast_search_rowscan(cur_a, refs, fme, False)["mv"])
    print("kernel vs xla solve parity:",
          "OK" if np.array_equal(mv_k, mv_x) else "MISMATCH", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "4k"
    pp.ONLY = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("only=")), None)
    from streamoptima_tpu.core import fastme as _fm

    for a in sys.argv:  # A/B knobs: unroll=0/1 onehot=0/1
        if a.startswith("unroll="):
            _fm._SLICE_UNROLL = bool(int(a.split("=")[1]))
        if a.startswith("onehot="):
            _fm._ONEHOT_SELECT = bool(int(a.split("=")[1]))
    print(f"knobs: unroll={_fm._SLICE_UNROLL} onehot={_fm._ONEHOT_SELECT}", flush=True)
    print("devices:", jax.devices(), flush=True)
    if which in ("720p", "all"):
        probe(720, 1280, sr=16)
    if which in ("1080p", "all"):
        probe(1088, 1920, sr=16)
    if which in ("4k", "all"):
        probe(2160, 3840, sr=16)
    print("WINFETCH PROBE DONE", flush=True)
