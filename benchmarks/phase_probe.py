"""Per-phase on-chip timing of the encode/decode step components.

Splits the VBS+FME step into its pipeline phases and times each in
isolation (block_until_ready, best of N) so perf work targets the real
bottleneck instead of the end-to-end wall.  Run on the real chip:

    python benchmarks/phase_probe.py [720p|4k|all]

Phases: Pallas search (argmin-only), encode winner fetch (device table +
compact DMA), transform+RD+quant, rle_length alone (the diagonal-order
gather), reconstruction (dequant+IDCT+wrap), decode prediction fetch
(host table), intra step (wavefront recon), and the full jitted steps for
cross-checking that the phases add up.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, *args, n=5, **kw):
    """Best wall seconds of n runs (first call compiles separately)."""
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def probe(h, w, sr=8, frames=4):
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.core import me_pallas as MP
    from streamoptima_tpu.core import rd
    from streamoptima_tpu.jax_engine import JaxCodec
    from streamoptima_tpu.utils import synthetic_clip

    name = f"{w}x{h}"
    print(f"===== {name} sr={sr} vbs+fme =====", flush=True)
    cfg = CodecConfig(height=h, width=w, frames=frames, block_size=16, qp=4,
                      intra_dur=frames, search_range=sr, vbs_enable=True,
                      fme_enable=True, me_search="pallas")
    clip = synthetic_clip(h, w, frames)
    codec = JaxCodec(cfg, clip)
    bs, sbs = 16, 8
    nbr, nbc = h // bs, w // bs
    nb = nbr * nbc
    interp = jax.default_backend() != "tpu"

    cur = jnp.asarray(clip[1].astype(np.int32))
    refs = jnp.asarray(clip[0][None].astype(np.uint8))

    # 1. Pallas FME search, argmin-only (the winner_fetch="fetch" search)
    f = jax.jit(lambda c, r: MP.full_search_pallas_fme(
        c, r, sr, bs, sbs, True, interpret=interp, want_pred=False))
    t, s = timed(f, cur, refs)
    print(f"search_argmin_fme:      {t*1e3:8.2f} ms", flush=True)

    # 1b. in-kernel predictions variant for comparison
    f2 = jax.jit(lambda c, r: MP.full_search_pallas_fme(
        c, r, sr, bs, sbs, True, interpret=interp, want_pred=True))
    t2, _ = timed(f2, cur, refs)
    print(f"search_inkernel_fme:    {t2*1e3:8.2f} ms", flush=True)

    mv = s["mv"]
    smv = s["sub_mv"].reshape(nb, 4, 3)

    # 2. encode winner fetch: device table build + compact-DMA fetch
    def wfetch(mv, smv, refs):
        tab = MP.build_fetch_table_jax(mv, smv, sr, True, True, nbr, nbc, bs, 1)
        return MP.pred_fetch_compact(mv, smv, refs, tab, sr + 1, bs, sbs, True, True,
                                     interpret=interp)
    t, _ = timed(jax.jit(wfetch), mv, smv, refs)
    print(f"winner_fetch (tab+dma): {t*1e3:8.2f} ms", flush=True)

    # 2b. table build alone
    t, _ = timed(jax.jit(lambda m, q: MP.build_fetch_table_jax(
        m, q, sr, True, True, nbr, nbc, bs, 1)), mv, smv)
    print(f"  table_build_jax:      {t*1e3:8.2f} ms", flush=True)

    # 3. transform + RD + quant (random plausible residuals)
    rng = np.random.default_rng(0)
    res_f = jnp.asarray(rng.integers(-40, 41, (nb, bs, bs)).astype(np.int32))
    res_q = jnp.asarray(rng.integers(-40, 41, (nb, 4, sbs, sbs)).astype(np.int32))
    sad_f = jnp.asarray(rng.integers(0, 4000, nb).astype(np.int32))
    sad_q = jnp.asarray(rng.integers(0, 1200, (nb, 4)).astype(np.int32))
    qps = jnp.full((nb,), 4, jnp.int32)
    elig = codec.vbs_eligible
    f3 = jax.jit(lambda a, b, c, d: rd.transform_and_select(
        a, b, c, d, 1, qps, qp_nominal=4, lam=0.015, vbs_enable=True,
        vbs_eligible=elig, bs=bs, sbs=sbs))
    t, (split, qtc_f, qtc_q, lens, _) = timed(f3, res_f, res_q, sad_f, sad_q)
    print(f"transform_rd_quant:     {t*1e3:8.2f} ms", flush=True)

    # 3b. rle_length alone (x3 inside the phase above): the diagonal-order
    # last-axis permutation gather — check XLA's lowering cost
    from streamoptima_tpu.core.zigzag import rle_length
    t, _ = timed(jax.jit(rle_length), qtc_f)
    print(f"  rle_length full:      {t*1e3:8.2f} ms", flush=True)

    # 4. reconstruction (dequant + IDCT + wrap + stitch), preds given
    predf = jnp.asarray(rng.integers(0, 256, (nb, bs, bs)).astype(np.int32))
    predq = jnp.asarray(rng.integers(0, 256, (nb, 4, sbs, sbs)).astype(np.int32))
    f4 = jax.jit(lambda sp, qf, qq: codec._recon_inter(
        None, mv, sp, smv, qf, qq, codec.row_qps_by_type[1], True, preds=(predf, predq)))
    t, _ = timed(f4, split, qtc_f, qtc_q)
    print(f"recon (dequant+idct):   {t*1e3:8.2f} ms", flush=True)

    # 5. decode prediction fetch with a HOST-built banded table (the real
    # decode dispatch shape; MV diversity from the actual search winners)
    tab_np = MP.build_fetch_table(np.asarray(mv), np.asarray(smv), sr, True, True,
                                  nbr, nbc, bs)
    assert tab_np is not None
    tab = jnp.asarray(tab_np[0])
    ncand = [int((tab_np[0][i, 4] != -1).sum()) for i in range(tab_np[0].shape[0])]
    f5 = jax.jit(lambda m, q, r, t_: MP.pred_fetch_compact(
        m, q, r, t_, sr + 1, bs, sbs, True, True, interpret=interp))
    t, _ = timed(f5, mv, smv, refs, tab)
    print(f"decode_fetch (host tab):{t*1e3:8.2f} ms  bands={len(ncand)} cands/band={ncand[:6]}", flush=True)

    # 6. full jitted steps for the cross-check
    rq1 = codec.row_qps_by_type[1]
    t, _ = timed(codec._inter_step_j, jnp.asarray(clip[1]), refs, rq1,
                 jnp.asarray(clip[1]), nref=1, initial_refs=True)
    print(f"inter_step (e2e):       {t*1e3:8.2f} ms", flush=True)
    t, _ = timed(codec._intra_step_j, jnp.asarray(clip[0]), codec.row_qps_by_type[0],
                 jnp.asarray(clip[0]))
    print(f"intra_step (e2e):       {t*1e3:8.2f} ms", flush=True)

    # 7. decode steps end to end
    qf16 = qtc_f.astype(jnp.int16)
    qq16 = qtc_q.astype(jnp.int16)
    f7 = jax.jit(lambda: codec._decode_inter_pallas_step(
        refs, mv, split, smv, qf16, qq16, rq1, tab, nref=1, initial_refs=True))
    t, _ = timed(f7)
    print(f"decode_step_pallas:     {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    if which in ("720p", "all"):
        probe(720, 1280)
    if which in ("4k", "all"):
        probe(2160, 3840)
    print("PROBE DONE", flush=True)
