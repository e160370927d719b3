"""Tunnel-proof per-phase timing of the encode/decode pipeline.

``phase_probe.py`` times each phase with repeated identical dispatches;
over the tunneled dev chip that is doubly untrustworthy — every
block_until_ready pays the ~30 ms sync floor, and identical requests can
be served from the tunnel's cache (a 720p search "measured" 0.10 ms that
way).  Here every phase runs INSIDE one jitted ``lax.fori_loop`` whose
carry alternates between two real inputs under a data-dependent bit (so
XLA cannot hoist the phase, and the tunnel sees a single request), and
the reported per-iteration cost is ``(t(2n) - t(n)) / n`` — the sync
floor, argument upload, and loop-invariant setup cancel in the
difference.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/phase_probe2.py [720p|4k|all]
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

try:  # chained 4K programs take minutes through the remote compile service
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _mix_bit(out):
    """Data-dependent bit from a phase output pytree.

    FULL sums, not first elements: with O(1) reads XLA dead-code-eliminates
    every output element that does not reach the read — an elementwise-
    parallel phase (the segment-sum intra search, residual builds) then
    "measures" near zero (round-5: the rewritten search costed 0.0 ms until
    this fix).  The added reduction is ~one pass over the outputs — small
    against any phase worth probing, and identical across A/B arms."""
    s = jnp.int32(0)
    for leaf in jax.tree.leaves(out):
        if leaf is None:
            continue
        s = s + leaf.astype(jnp.int32).sum()  # int32 wrap is fine for a bit
    return s & 1


def chain_time(name, fn, a, b, n=6, reps=3):
    """Per-iteration seconds of ``fn`` chained n vs 2n times in one jit.

    ``a``/``b``: two valid input pytrees of identical structure; each
    iteration selects between them with the carry bit and flips the bit
    with an output-derived value, so consecutive iterations are data
    dependent and cannot be deduplicated or hoisted.
    """
    if ONLY is not None and ONLY not in name:
        return None

    @functools.partial(jax.jit, static_argnums=0)
    def run(iters, av, bv):
        # av/bv are ARGUMENTS, not captured constants: XLA constant-folds
        # whole constant-fed loops at compile time (observed: the round-5
        # segment-sum intra search "measured" 0.0 ms as a closure).  The
        # accumulator perturbs the INPUT, not just the select bit: for a
        # select-sinkable fn (pure elementwise/reshape/reduce graphs) XLA
        # rewrites fn(select(bit, a, b)) -> select(bit, fn(a), fn(b)) and
        # hoists both arms out of the loop as loop-invariant — per-iter
        # then "measures" ~0.  acc & 1 makes every iteration's input a
        # fresh value no motion pass can hoist.
        def body(_, st):
            bit, acc = st

            def sel(u, v):
                o = jnp.where(bit != 0, u, v)
                if o.dtype == jnp.bool_:
                    return o
                return o + (acc & 1).astype(o.dtype)

            x = jax.tree.map(sel, av, bv)
            out = fn(x)
            mb = _mix_bit(out)
            return (bit ^ mb, acc + mb)

        return lax.fori_loop(0, iters, body, (jnp.int32(1), jnp.int32(0)))

    try:
        jax.block_until_ready(run(n, a, b))
        jax.block_until_ready(run(2 * n, a, b))
    except Exception as e:  # noqa: BLE001 — report and keep probing
        print(f"{name:<28}FAILED: {str(e)[:160]}", flush=True)
        return None

    def best(iters):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(iters, a, b))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = best(n), best(2 * n)
    per = (t2 - t1) / n
    print(f"{name:<28}{per*1e3:9.2f} ms/iter   (t{n}={t1*1e3:.1f} t{2*n}={t2*1e3:.1f})",
          flush=True)
    return per


ONLY = None  # optional substring filter over phase names (CLI only=...)


def probe(h, w, sr=8, vbs=True, fme=True):
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec
    from streamoptima_tpu.utils import synthetic_clip

    print(f"===== {w}x{h} sr={sr} vbs={vbs} fme={fme} =====", flush=True)
    frames = 4
    cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                      intra_dur=frames, search_range=sr, vbs_enable=vbs,
                      fme_enable=fme, me_search="pallas")
    clip = synthetic_clip(h, w, frames)
    codec = JaxCodec(cfg, clip)
    import dataclasses
    codec_ik = JaxCodec(dataclasses.replace(cfg, winner_fetch="inkernel"), clip)
    codec_f = JaxCodec(dataclasses.replace(cfg, winner_fetch="fetch"), clip)

    refs = codec._y_dev[:1]
    cur_a = codec._y_dev[1].astype(jnp.int32)
    cur_b = codec._y_dev[2].astype(jnp.int32)
    rqp = codec.row_qps_by_type[1]

    # real encode outputs for the downstream-phase inputs
    enc_a = codec._inter_step_j(codec._y_dev[1], refs, rqp, codec._y_dev[1],
                                nref=1, initial_refs=False)
    enc_b = codec._inter_step_j(codec._y_dev[2], refs, rqp, codec._y_dev[2],
                                nref=1, initial_refs=False)
    jax.block_until_ready((enc_a, enc_b))

    # 1. production search + winner preds (auto policy)
    chain_time("search+preds (auto)",
               lambda c: codec._full_search_pallas(c, refs, fme, False),
               cur_a, cur_b)
    # 1b. in-kernel winner select
    chain_time("search+preds (inkernel)",
               lambda c: codec_ik._full_search_pallas(c, refs, fme, False),
               cur_a, cur_b)
    # 1c. argmin search + compact-DMA fetch
    chain_time("search+preds (fetch)",
               lambda c: codec_f._full_search_pallas(c, refs, fme, False),
               cur_a, cur_b)

    # 2. transform + RD + quant (+ rle_length x3 inside)
    cur_blocks = codec._blockify(cur_a)
    pf_a = codec._blockify(cur_b)  # plausible preds: another frame's pixels
    res_f = cur_blocks - pf_a
    res_q = codec._quads_of(res_f)
    nb = codec.nb
    rng = np.random.default_rng(0)
    sad_f = jnp.asarray(rng.integers(0, 4000, nb).astype(np.int32))
    sad_q = jnp.asarray(rng.integers(0, 1200, (nb, 4)).astype(np.int32))
    chain_time("transform_rd_quant",
               lambda r: codec._transform_and_select(r, codec._quads_of(r), sad_f, sad_q, 1, rqp),
               res_f, -res_f)

    from streamoptima_tpu.core.zigzag import rle_length
    chain_time("rle_length(full)", rle_length, enc_a["qtc_full"], enc_b["qtc_full"])

    # 3. reconstruction given preds (dequant + idct + wrap + stitch)
    pred_q = codec._quads_of(pf_a) if vbs else None
    mv = enc_a["mv"]
    smv = enc_a["sub_mv"]
    chain_time("recon(dequant+idct)",
               lambda t: codec._recon_inter(None, mv, t[0], smv, t[1], t[2], rqp, fme,
                                            preds=(pf_a, pred_q)),
               (enc_a["split"], enc_a["qtc_full"], enc_a["qtc_quads"]),
               (enc_b["split"], enc_b["qtc_full"], enc_b["qtc_quads"]))

    # 4. full inter step, chained on the reconstruction (the honest e2e)
    def full_step(r):
        out = codec._inter_step(codec._y_dev[1], r[None], rqp, codec._y_dev[1],
                                nref=1, initial_refs=False)
        return out["recon"]
    chain_time("inter_step e2e", full_step, codec._y_dev[0], codec._y_dev[2], n=4)

    # 5. intra step chained on its own reconstruction
    rqp0 = codec.row_qps_by_type[0]
    def intra_step(c):
        return codec._intra_step(c, rqp0, c)["recon"]
    chain_time("intra_step e2e", intra_step, codec._y_dev[0], codec._y_dev[1], n=4)

    # 6. decode fetch step chained on the reconstruction (production decode)
    tab = codec._fetch_table(enc_a["mv"], enc_a["sub_mv"])
    if tab is not None:
        def dec_step(r):
            return codec._decode_inter_pallas_step(
                r[None], mv, enc_a["split"], smv, enc_a["qtc_full"], enc_a["qtc_quads"],
                rqp, tab, nref=1, initial_refs=False)
        chain_time("decode_step (fetch)", dec_step, codec._y_dev[0], codec._y_dev[2], n=4)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    ONLY = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("only=")), None)
    print("devices:", jax.devices(), flush=True)
    if which == "tiny":  # CPU syntax/tracing sanity (interpret mode is slow)
        probe(64, 128)
    if which in ("720p", "all"):
        probe(720, 1280)
    if which in ("4k", "all"):
        probe(2160, 3840)
    print("PROBE2 DONE", flush=True)
