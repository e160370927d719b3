"""Pallas full-search kernel: bit parity with the NumPy oracle (interpret
mode on CPU; the same checks run compiled on TPU in the bench driver).

Covers the round-2 kernel extensions: in-kernel prediction outputs (vs the
gather_predictions oracle), the direct-parity-plane FME contract (raw refs
in, no upsample), and halo-band search for row-sharded tiles
(read_row0/g_px0/grid_dims — VERDICT.md round-1 item 3)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamoptima_tpu.core import me as M
from streamoptima_tpu.core import pred as P
from streamoptima_tpu.core.me_pallas import full_search_pallas, full_search_pallas_fme


def _block_coords(h, w, bs):
    nbr, nbc = h // bs, w // bs
    ys, xs = np.meshgrid(np.arange(nbr) * bs, np.arange(nbc) * bs, indexing="ij")
    return xs.reshape(-1), ys.reshape(-1)


def _quad_coords(h, w, bs):
    sbs = bs // 2
    bx, by = _block_coords(h, w, bs)
    offs = np.array([[0, 0], [0, 1], [1, 0], [1, 1]]) * sbs
    qx = (bx[:, None] + offs[None, :, 1]).reshape(-1)
    qy = (by[:, None] + offs[None, :, 0]).reshape(-1)
    return qx, qy


def _blockify(band, bs):
    h, w = band.shape
    return band.reshape(h // bs, bs, w // bs, bs).swapaxes(1, 2).reshape(-1, bs, bs)


def _quadify(band, bs):
    sbs = bs // 2
    h, w = band.shape
    return band.reshape(h // bs, 2, sbs, w // bs, 2, sbs).transpose(0, 3, 1, 4, 2, 5).reshape(
        -1, 4, sbs, sbs
    )


def _check_preds(out, search_refs, h, w, bs, fme):
    """Kernel pred bands == gather_predictions at the winning MVs (ok blocks;
    !ok blocks take the mv=(0,0,0) all-128 fallback, verified too)."""
    bx, by = _block_coords(h, w, bs)
    g = P.gather_predictions(out["mv"], search_refs, jnp.asarray(bx), jnp.asarray(by), bs, fme, jnp)
    pf = _blockify(np.asarray(out["pred"]), bs)
    ok = np.asarray(out["ok"])
    np.testing.assert_array_equal(np.asarray(g)[ok], pf[ok])
    if fme and (~ok).any():
        np.testing.assert_array_equal(np.asarray(g)[~ok], np.full(((~ok).sum(), bs, bs), 128))
    qx, qy = _quad_coords(h, w, bs)
    gq = P.gather_predictions(
        out["sub_mv"].reshape(-1, 3), search_refs, jnp.asarray(qx), jnp.asarray(qy), bs // 2, fme, jnp
    ).reshape(-1, 4, bs // 2, bs // 2)
    pq = _quadify(np.asarray(out["pred_quads"]), bs)
    sok = np.asarray(out["sub_ok"])
    np.testing.assert_array_equal(np.asarray(gq)[sok], pq[sok])


@pytest.mark.parametrize(
    "h,w,sr,nref,nvalid",
    [
        (64, 128, 4, 1, None),
        (96, 128, 8, 2, None),
        (64, 128, 4, 3, 2),
        (128, 256, 16, 1, None),
    ],
)
def test_pallas_matches_oracle(h, w, sr, nref, nvalid):
    rng = np.random.default_rng(h + w + sr)
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    refs = rng.integers(0, 256, (nref, h, w)).astype(np.int32)
    a = M.full_search_materialized(cur, refs, sr, 16, 8, 1, False, True, np, nvalid=nvalid)
    b = full_search_pallas(
        jnp.asarray(cur), jnp.asarray(refs), sr, 16, 8, True,
        nvalid=None if nvalid is None else jnp.int32(nvalid), interpret=True,
    )
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
    _check_preds(b, jnp.asarray(refs), h, w, 16, False)


def test_pallas_translating_texture():
    """Real motion: the winner MVs must recover the global translation."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (80, 144)).astype(np.int32)
    ref = base[2 : 2 + 64, 3 : 3 + 128]
    cur = base[0:64, 0:128]  # cur(x) == ref(x + (-3, -2))... in ref coords
    out = full_search_pallas(jnp.asarray(cur), jnp.asarray(ref)[None], 4, 16, 8, False, interpret=True)
    mv = np.asarray(out["mv"]).reshape(4, 8, 3)
    # interior blocks: exact match at displacement (-3, -2)
    assert (mv[1:3, 2:6, 0] == -3).all() and (mv[1:3, 2:6, 1] == -2).all()
    assert (np.asarray(out["sad"]).reshape(4, 8)[1:3, 2:6] == 0).all()


@pytest.mark.parametrize(
    "h,w,sr,nref,nvalid,wrap",
    [
        (64, 128, 4, 1, None, True),
        (64, 128, 8, 2, 1, False),
    ],
)
def test_pallas_fme_matches_oracle(h, w, sr, nref, nvalid, wrap):
    """Half-pel kernel (raw refs in; parity planes computed in-kernel) vs
    the XLA oracle searching the materialized upsample at double range."""
    rng = np.random.default_rng(h + sr)
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    refs = rng.integers(0, 256, (nref, h, w)).astype(np.uint8)
    ups = np.stack([M.fme_upsample(r if wrap else r.astype(np.int32), np) for r in refs])
    a = M.full_search_materialized(cur, ups, 2 * sr, 16, 8, 2, True, True, np, nvalid=nvalid)
    b = full_search_pallas_fme(
        jnp.asarray(cur), jnp.asarray(refs), sr, 16, 8, True,
        nvalid=None if nvalid is None else jnp.int32(nvalid), interpret=True,
        wrap_row_pass=wrap,
    )
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
    _check_preds(b, jnp.asarray(ups), h, w, 16, True)


def test_parity_planes_match_upsample_slices():
    rng = np.random.default_rng(3)
    for wrap in (True, False):
        f = rng.integers(0, 256, (24, 40)).astype(np.uint8)
        up = M.fme_upsample(f if wrap else f.astype(np.int32), np, wrap_row_pass=wrap)
        planes = M.fme_parity_planes(f, np, wrap_row_pass=wrap)
        for i, (py, px) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            sl = up[py::2, px::2]
            exp = np.zeros((24, 40), np.int32)
            exp[: sl.shape[0], : sl.shape[1]] = sl
            np.testing.assert_array_equal(planes[i], exp, err_msg=f"plane {py}{px} wrap={wrap}")


@pytest.mark.parametrize("fme", [False, True])
def test_pallas_banded_matches_full_frame(fme):
    """Halo-band search (read_row0/g_px0/grid_dims) == the matching slice of
    the full-frame search, including preds — the contract the row-sharded
    mesh encoder relies on."""
    rng = np.random.default_rng(7)
    h, w, bs, sr, nref = 64, 128, 16, 4, 2
    nbc = w // bs
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    refs = rng.integers(0, 256, (nref, h, w)).astype(np.uint8)
    halo8, y0, h_t = 8, 16, 32
    band = refs[:, y0 - halo8 : y0 + h_t + halo8, :]
    cur_t = cur[y0 : y0 + h_t]
    if fme:
        full = full_search_pallas_fme(jnp.asarray(cur), jnp.asarray(refs), sr, bs, 8, True, interpret=True)
        tile = full_search_pallas_fme(
            jnp.asarray(cur_t), jnp.asarray(band), sr, bs, 8, True, interpret=True,
            read_row0=halo8, g_px0=y0, grid_dims=(2 * h - 1, 2 * w - 1),
        )
    else:
        full = full_search_pallas(jnp.asarray(cur), jnp.asarray(refs).astype(jnp.int32), sr, bs, 8, True, interpret=True)
        tile = full_search_pallas(
            jnp.asarray(cur_t), jnp.asarray(band).astype(jnp.int32), sr, bs, 8, True, interpret=True,
            read_row0=halo8, g_px0=y0, grid_dims=(h, w),
        )
    sel = slice((y0 // bs) * nbc, ((y0 + h_t) // bs) * nbc)
    for k in ("mv", "sad", "ok", "sub_mv", "sub_sad", "sub_ok"):
        np.testing.assert_array_equal(np.asarray(full[k])[sel], np.asarray(tile[k]), err_msg=k)
    for k in ("pred", "pred_quads"):
        np.testing.assert_array_equal(np.asarray(full[k])[y0 : y0 + h_t], np.asarray(tile[k]), err_msg=k)


@pytest.mark.parametrize("fme,vbs", [(False, False), (True, True)])
def test_jax_engine_pallas_path_matches_xla(fme, vbs):
    """The full engine step with me_search='pallas' (in-kernel preds, no
    gathers) == me_search='materialized', bit for bit."""
    import dataclasses

    from conftest import synthetic_clip
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec

    clip = synthetic_clip(h=64, w=64, frames=4, motion=2)
    cfg = CodecConfig(height=64, width=64, frames=4, search_range=4, qp=4, intra_dur=4,
                      vbs_enable=vbs, fme_enable=fme, lam=0.015, n_ref_frames=2,
                      me_search="materialized")
    a = JaxCodec(cfg, clip).encode()
    b = JaxCodec(dataclasses.replace(cfg, me_search="pallas"), clip).encode()
    np.testing.assert_array_equal(a["reconstructed frames"], b["reconstructed frames"])
    assert a["residual size per frame"] == b["residual size per frame"]
    for fa, fb in zip(a["MVS per Frame"], b["MVS per Frame"]):
        assert fa == fb


@pytest.mark.parametrize("tile_comm", ["halo", "all_gather"])
def test_mesh_pallas_path_matches_xla(tile_comm):
    """Sharded encode with the Pallas kernel on row-sharded tiles (halo bands,
    VERDICT round-1 item 3) == the XLA fused path, bit for bit."""
    import dataclasses

    from conftest import synthetic_clip
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.parallel import ShardedCodec, make_mesh

    clip = synthetic_clip(h=64, w=64, frames=4, motion=2)
    cfg = CodecConfig(height=64, width=64, frames=4, search_range=4, qp=4, intra_dur=2,
                      vbs_enable=True, fme_enable=True, lam=0.015, me_search="fused")
    mesh = make_mesh(cfg, tile=2)
    a = ShardedCodec(cfg, mesh, clip, tile_comm=tile_comm).encode()
    b = ShardedCodec(dataclasses.replace(cfg, me_search="pallas"), mesh, clip, tile_comm=tile_comm).encode()
    np.testing.assert_array_equal(a["reconstructed frames"], b["reconstructed frames"])
    assert a["residual size per frame"] == b["residual size per frame"]
    for fa, fb in zip(a["MVS per Frame"], b["MVS per Frame"]):
        assert fa == fb


@pytest.mark.parametrize("fme", [False, True])
def test_pallas_column_tiles_match_untiled(fme, monkeypatch):
    """Column-tiled grid (wide-frame VMEM relief) is bit-identical to the
    untiled program — forced ncol=2 on a small frame."""
    from streamoptima_tpu.core import me_pallas

    rng = np.random.default_rng(3)
    h, w, sr, nref = 32, 256, 4, 2
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    refs = rng.integers(0, 256, (nref, h, w)).astype(np.int32)
    search = full_search_pallas_fme if fme else full_search_pallas
    base = search(jnp.asarray(cur), jnp.asarray(refs), sr, 16, 8, True, interpret=True)
    monkeypatch.setattr(me_pallas, "_col_tiles", lambda *a, **k: (2, 2))
    # new shapes -> fresh trace even under jit cache (the lambda changes
    # nothing hashable, so clear the jit cache explicitly)
    search._clear_cache()
    tiled = search(jnp.asarray(cur), jnp.asarray(refs), sr, 16, 8, True, interpret=True)
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(tiled[k]), err_msg=k)
    search._clear_cache()


def test_build_fetch_table_jax_matches_host():
    """Device-side DMA-table build (encode winner fetch, VERDICT r2 item 2)
    == the host builder, for both FME and whole-pel, up to slot order and
    bucket width (the kernel is order/padding-insensitive: each code claims
    its own blocks; code -1 matches nothing)."""
    from streamoptima_tpu.core.me_pallas import build_fetch_table, build_fetch_table_jax

    rng = np.random.default_rng(11)
    nb, sr = 48, 8
    for fme in (False, True):
        bound = 2 * sr if fme else sr
        mv = np.stack([rng.integers(-bound, bound + 1, nb),
                       rng.integers(-bound, bound + 1, nb),
                       rng.integers(0, 2, nb)], axis=1).astype(np.int32)
        smv = np.stack([rng.integers(-bound, bound + 1, (nb, 4)),
                        rng.integers(-bound, bound + 1, (nb, 4)),
                        rng.integers(0, 2, (nb, 4))], axis=2).astype(np.int32)
        nbr, nbc, bs = 6, 8, 16
        host_t, host_pad = build_fetch_table(mv, smv, sr, fme, True, nbr, nbc, bs)
        dev_t = np.asarray(build_fetch_table_jax(
            jnp.asarray(mv), jnp.asarray(smv), sr, fme, True, nbr, nbc, bs, nref=2
        ))
        assert host_pad == (sr + 1 if fme else sr)
        assert host_t.shape[0] == dev_t.shape[0]  # same banding
        for b in range(host_t.shape[0]):
            hcols = {tuple(c) for c in host_t[b].T.tolist() if c[4] != -1}
            dcols = {tuple(c) for c in dev_t[b].T.tolist() if c[4] != -1}
            assert hcols == dcols, (fme, b)


def test_build_fetch_table_jax_bitmap_matches_unique():
    """The bitmap dedup (small static winner grids) is bit-identical —
    including slot ORDER and padding — to the sort-based jnp.unique fallback
    it replaced (packed codes ascend with grid index, so the compacted
    bitmap is the ascending sorted-unique sequence)."""
    from streamoptima_tpu.core import me_pallas as MP

    rng = np.random.default_rng(7)
    nbr, nbc, bs, sr, nref = 9, 8, 16, 4, 2
    nb = nbr * nbc
    for fme in (False, True):
        bound = 2 * sr if fme else sr
        mv = np.stack([rng.integers(-bound, bound + 1, nb),
                       rng.integers(-bound, bound + 1, nb),
                       rng.integers(0, nref, nb)], axis=1).astype(np.int32)
        smv = np.stack([rng.integers(-bound, bound + 1, (nb, 4)),
                        rng.integers(-bound, bound + 1, (nb, 4)),
                        rng.integers(0, nref, (nb, 4))], axis=2).astype(np.int32)
        bitmap = np.asarray(MP.build_fetch_table_jax(
            jnp.asarray(mv), jnp.asarray(smv), sr, fme, True, nbr, nbc, bs, nref))
        cap = MP._BITMAP_WORK_CAP
        MP._BITMAP_WORK_CAP = 0
        try:
            uniq = np.asarray(MP.build_fetch_table_jax(
                jnp.asarray(mv + 0), jnp.asarray(smv + 0), sr, fme, True, nbr, nbc, bs, nref))
        finally:
            MP._BITMAP_WORK_CAP = cap
        np.testing.assert_array_equal(bitmap, uniq, err_msg=f"fme={fme}")


def test_winner_bucket_bounds():
    """The static table width covers every possible winner set exactly: the
    min of the candidate-grid size and the coded-(sub-)block count."""
    from streamoptima_tpu.core.me_pallas import winner_bucket

    # grid-bound: sr=8 whole-pel, 1 ref -> 17^2 = 289 -> 320
    assert winner_bucket(3600, 8, False, True, 1) == 320
    # block-bound: tiny frame, vbs -> 5 * 16 = 80 -> 128
    assert winner_bucket(16, 8, True, True, 4) == 128
    # fme doubles the displacement bound
    assert winner_bucket(10**6, 8, True, False, 1) == -(-33 * 33 // 64) * 64


@pytest.mark.parametrize("fme,vbs", [(False, False), (True, True)])
def test_winner_fetch_matches_inkernel(fme, vbs):
    """cfg.winner_fetch='fetch' (argmin-only search + compact-DMA winner
    fetch) == 'inkernel' (masked select in the search kernel), bit for bit."""
    import dataclasses

    from conftest import synthetic_clip
    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec

    clip = synthetic_clip(h=64, w=64, frames=4, motion=2)
    cfg = CodecConfig(height=64, width=64, frames=4, search_range=4, qp=4, intra_dur=4,
                      vbs_enable=vbs, fme_enable=fme, lam=0.015, n_ref_frames=2,
                      me_search="pallas", winner_fetch="inkernel")
    a = JaxCodec(cfg, clip).encode()
    b = JaxCodec(dataclasses.replace(cfg, winner_fetch="fetch"), clip).encode()
    np.testing.assert_array_equal(a["reconstructed frames"], b["reconstructed frames"])
    assert a["residual size per frame"] == b["residual size per frame"]
    for fa, fb in zip(a["MVS per Frame"], b["MVS per Frame"]):
        assert fa == fb


def test_winner_fetch_diverse_mvs():
    """Noise content maximizes winner-MV diversity — the worst-case-sized
    table must hold them all and stay bit-identical to the in-kernel path."""
    import dataclasses

    from streamoptima_tpu.config import CodecConfig
    from streamoptima_tpu.jax_engine import JaxCodec

    rng = np.random.default_rng(9)
    clip = rng.integers(0, 256, size=(3, 64, 64), dtype=np.uint8)
    cfg = CodecConfig(height=64, width=64, frames=3, search_range=4, qp=4, intra_dur=3,
                      vbs_enable=True, fme_enable=True, lam=0.015,
                      me_search="pallas", winner_fetch="inkernel")
    a = JaxCodec(cfg, clip).encode()
    b = JaxCodec(dataclasses.replace(cfg, winner_fetch="fetch"), clip).encode()
    np.testing.assert_array_equal(a["reconstructed frames"], b["reconstructed frames"])
    assert a["residual size per frame"] == b["residual size per frame"]


@pytest.mark.parametrize("fme", [False, True])
def test_pallas_nondivisor_band_matches(fme, monkeypatch):
    """Bands are VMEM-sized, not divisors of nbr (VERDICT r2 item 3): a
    forced band=2 over nbr=5 pads one block row in-kernel and must match the
    natural program bit for bit."""
    from streamoptima_tpu.core import me_pallas

    rng = np.random.default_rng(4)
    h, w, sr, nref = 80, 128, 4, 2
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    refs = rng.integers(0, 256, (nref, h, w)).astype(np.int32)
    search = full_search_pallas_fme if fme else full_search_pallas
    base = search(jnp.asarray(cur), jnp.asarray(refs), sr, 16, 8, True, interpret=True)
    monkeypatch.setattr(me_pallas, "_col_tiles", lambda *a, **k: (1, 2))
    search._clear_cache()
    padded = search(jnp.asarray(cur), jnp.asarray(refs), sr, 16, 8, True, interpret=True)
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(padded[k]), err_msg=k)
    search._clear_cache()


@pytest.mark.parametrize("fme", [False, True])
def test_pallas_column_tiled_matches(fme, monkeypatch):
    """Column tiling (the 2*w_t/8-FLOPs-per-pixel aggregation cost rule,
    round-3) must be bit-identical to the untiled program — forced ncol=2 on
    a small frame, both prediction-carrying and argmin-only variants."""
    from streamoptima_tpu.core import me_pallas

    rng = np.random.default_rng(6)
    h, w, sr, nref = 64, 256, 4, 2
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    refs = rng.integers(0, 256, (nref, h, w)).astype(np.int32)
    search = full_search_pallas_fme if fme else full_search_pallas
    for want_pred in (True, False):
        base = search(jnp.asarray(cur), jnp.asarray(refs), sr, 16, 8, True,
                      interpret=True, want_pred=want_pred)
        monkeypatch.setattr(me_pallas, "_col_tiles", lambda *a, **k: (2, 2))
        search._clear_cache()
        tiled = search(jnp.asarray(cur), jnp.asarray(refs), sr, 16, 8, True,
                       interpret=True, want_pred=want_pred)
        monkeypatch.undo()
        search._clear_cache()
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(tiled[k]), err_msg=f"{k} pred={want_pred}"
            )


def test_band_model_pinned_points():
    """VMEM-model pinning (VERDICT r2 item 9): band/column-tile selections
    for the supported shape matrix, anchored to the round-3 compile-probe
    sweep (benchmarks/vmem_probe.py — compile-only AOT probes on the real
    chip, each class bracketed by the tallest band that compiled and, where
    listed in me_pallas._MEASURED_MAX_BAND, the scoped-OOM one row taller).
    Any model change that silently regresses a band for these classes (or
    collapses a supported class below 4 rows) fails here, compile-free."""
    from streamoptima_tpu.core.me_pallas import _band_rows, _col_tiles

    # probed maxima: (1280 untiled, qpred, nd=17) compiles at 13, OOMs at 14
    # (16.60M vs the 16M scoped limit)
    assert _band_rows(45, 1280, 16, True, True, 17, budget_mb=15.8) == 13
    # widest-tile-first selections, every pair chip-verified (vmem_probe or a
    # production sweep run); argmin classes now ride the measured table past
    # the legacy 16-row cap (720p 24, 1080p/4K-tile 20)
    assert _col_tiles(1280, 45, 16, True, True, 17) == (1, 13)   # 720p vbs+fme inkernel
    # round-4: the (1920, 2, qpred, 17) probe (8 OK / 9 OOM 16.52M) lets the
    # WIDER ncol=2 tile reach the 8-row bar, displacing round-3's (3, 10)
    # pick — wider-at->=8-rows is the measured round-3 preference
    assert _col_tiles(3840, 135, 16, True, True, 17) == (2, 8)   # 4K vbs+fme inkernel
    assert _col_tiles(3840, 135, 16, True, False, 17, fme=False) == (2, 9)  # 4K plain
    assert _col_tiles(3840, 135, 16, False, False, 17) == (2, 20)  # 4K argmin-only
    assert _col_tiles(1280, 45, 16, False, False, 17) == (1, 24)  # 720p argmin-only
    assert _col_tiles(1920, 68, 16, False, False, 17) == (1, 20)  # 1080p argmin-only
    assert _col_tiles(1920, 68, 16, True, True, 17) == (1, 8)    # 1080p vbs+fme inkernel
    assert _col_tiles(1920, 68, 16, True, False, 17, fme=False) == (1, 11)  # 1080p plain
    assert _col_tiles(1280, 45, 16, True, False, 33, fme=False) == (1, 10)  # 720p plain sr16
    assert _col_tiles(1280, 45, 16, True, True, 33) == (2, 12)   # 720p vbs+fme sr16 inkernel
    assert _col_tiles(352, 18, 16, True, True, 17) == (1, 16)    # CIF: untiled
    # round-4 closure (VERDICT r3 item 6): every sr=16 class measured
    assert _col_tiles(1280, 45, 16, True, False, 33) == (1, 11)  # 720p sr16 fme plain
    assert _col_tiles(1920, 68, 16, True, False, 33, fme=False) == (1, 8)   # 1080p sr16 plain
    assert _col_tiles(1920, 68, 16, True, True, 33) == (3, 11)   # 1080p sr16 inkernel
    assert _col_tiles(1920, 68, 16, False, False, 33) == (1, 16)  # 1080p sr16 argmin
    assert _col_tiles(3840, 135, 16, True, False, 33, fme=False) == (5, 9)  # 4K sr16 plain
    assert _col_tiles(3840, 135, 16, True, True, 33) == (2, 6)   # 4K sr16 inkernel
    assert _col_tiles(3840, 135, 16, False, False, 33) == (2, 18)  # 4K sr16 argmin
    # the supported matrix never collapses below 4 rows
    for w, nbr in ((352, 18), (1280, 45), (1920, 68), (3840, 135)):
        for nd in (17, 33):
            for fme in (True, False):
                for pred, qpred in ((False, False), (True, False), (True, True)):
                    ncol, band = _col_tiles(w, nbr, 16, pred, qpred, nd, fme)
                    assert band >= min(4, nbr), (w, nbr, nd, fme, pred, qpred, ncol, band)
    # fetch-kernel band (nd=1) stays healthy at 720p
    assert _band_rows(45, 1280, 16, True, True, 1) >= 8
