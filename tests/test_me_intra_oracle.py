"""Oracle tests: vectorized ME / intra primitives vs the reference's own
per-block functions (imported from /root/reference, skipped if absent)."""
import numpy as np
import pytest

from streamoptima_tpu.core import intra as I
from streamoptima_tpu.core import me as M
from streamoptima_tpu.core import pred as P

from conftest import synthetic_clip


def make_codec(Encoder, h, w, frames=2, bs=16, sr=4, fme=False, fast=False, vbs=False):
    y = synthetic_clip(h, w, frames)
    return Encoder.Y_Video_codec(
        h, w, frames, block_size=bs, search_range=sr, Qp=4, intra_dur=2, intra_mode=0,
        lam=0.015, VBSEnable=vbs, nRefFrames=1, y_only_frame_arr=y,
        fast_me=fast, FMEEnable=fme, RCFlag=None, targetBR=None,
    )


@pytest.mark.parametrize("dtype", [np.float64, np.uint8])
def test_fme_upsample_matches_reference(ref_modules, dtype):
    Encoder, _ = ref_modules
    enc = make_codec(Encoder, 32, 48)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, size=(32, 48)).astype(dtype)
    ref_up = enc.frac_me_reference_frame([frame], 16)[0]
    mine = M.fme_upsample(frame, np)
    assert ref_up.shape == mine.shape
    assert np.array_equal(ref_up.astype(np.int64), mine.astype(np.int64))


def _search_all_blocks(cur, refs_arr, bs, sr, fme, sub_bs):
    """Assemble the engine search from primitives: returns mv (nb,3), sad (nb,)."""
    h, w = cur.shape
    scale = 2 if fme else 1
    H, W = refs_arr.shape[-2:]
    maps = np.stack([M.sad_maps(cur, r, sr, sub_bs, scale, np) for r in refs_arr])
    # full-block SAD = sum of quadrant SADs when bs == 2*sub_bs
    if bs == sub_bs:
        sad_b = maps.reshape(maps.shape[0], maps.shape[1], maps.shape[2], -1)
    else:
        nref, ndy, ndx = maps.shape[:3]
        nbr2, nbc2 = maps.shape[3:]
        q = maps.reshape(nref, ndy, ndx, nbr2 // 2, 2, nbc2 // 2, 2).sum(axis=(4, 6))
        sad_b = q.reshape(nref, ndy, ndx, -1)
    nbr, nbc = h // bs, w // bs
    ys, xs = np.meshgrid(np.arange(nbr) * bs, np.arange(nbc) * bs, indexing="ij")
    bx = (xs.reshape(-1) * scale).astype(np.int64)
    by = (ys.reshape(-1) * scale).astype(np.int64)
    valid = np.stack([M.candidate_valid_mask(bx, by, sr, bs, H, W, fme, np) for _ in range(len(refs_arr))])
    mv, sad, ok = M.argmin_displacement(sad_b, valid, sr, ref_axis=True, xp=np)
    return mv, sad, ok


@pytest.mark.parametrize("fme", [False, True])
@pytest.mark.parametrize("nref", [1, 2])
def test_full_search_matches_reference(ref_modules, fme, nref):
    Encoder, _ = ref_modules
    h, w, bs, sr = 48, 64, 16, 3
    enc = make_codec(Encoder, h, w, fme=fme, sr=sr)
    rng = np.random.default_rng(1)
    cur = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    refs = [rng.integers(0, 256, size=(h, w)).astype(np.float64) for _ in range(nref)]
    if fme:
        refs_search = enc.frac_me_reference_frame(refs, bs)
        sr_eff = sr * 2  # complete_inter_flow doubles the range (Encoder.py:1649)
    else:
        refs_search = refs
        sr_eff = sr
    refs_arr = np.stack([np.asarray(r, dtype=np.int32) for r in refs_search])
    mv, sad, ok = _search_all_blocks(cur.astype(np.int32), refs_arr, bs, sr_eff, fme, bs // 2)
    idx = 0
    for y in range(0, h, bs):
        for x in range(0, w, bs):
            blk = cur[y : y + bs, x : x + bs]
            scale = 2 if fme else 1
            ref_mv, ref_mae = enc.find_best_match(blk, refs_search, x * scale, y * scale, bs, sr_eff)
            assert tuple(mv[idx]) == ref_mv, (x, y, tuple(mv[idx]), ref_mv)
            if ref_mae == float("inf"):
                assert not ok[idx]
            else:
                assert sad[idx] / (bs * bs) == ref_mae
            idx += 1


def test_sub_block_search_matches_reference(ref_modules):
    Encoder, _ = ref_modules
    h, w, bs, sr = 32, 48, 16, 4
    enc = make_codec(Encoder, h, w, sr=sr)
    rng = np.random.default_rng(2)
    cur = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    ref = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    refs_arr = np.asarray(ref, dtype=np.int32)[None]
    s = bs // 2
    mv, sad, ok = _search_all_blocks(cur.astype(np.int32), refs_arr, s, sr, False, s)
    idx = 0
    for y in range(0, h, s):
        for x in range(0, w, s):
            blk = cur[y : y + s, x : x + s]
            ref_mv, ref_mae = enc.find_best_match(blk, [ref], x, y, s, sr)
            assert tuple(mv[idx]) == ref_mv
            assert sad[idx] / (s * s) == ref_mae
            idx += 1


@pytest.mark.parametrize("fme", [False, True])
def test_prediction_gather_matches_reference(ref_modules, fme):
    Encoder, _ = ref_modules
    h, w, bs = 48, 64, 16
    enc = make_codec(Encoder, h, w, fme=fme)
    rng = np.random.default_rng(3)
    cur = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    ref = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    refs = enc.frac_me_reference_frame([ref], bs) if fme else [ref]
    refs_arr = np.stack([np.asarray(r, dtype=np.int32) for r in refs])
    nbr, nbc = h // bs, w // bs
    ys, xs = np.meshgrid(np.arange(nbr) * bs, np.arange(nbc) * bs, indexing="ij")
    # random (incl. out-of-range) mvs exercise all three boundary cases
    mvs = np.stack(
        [rng.integers(-40, 41, size=nbr * nbc), rng.integers(-40, 41, size=nbr * nbc), np.zeros(nbr * nbc, dtype=int)],
        axis=1,
    ).astype(np.int32)
    pred = P.gather_predictions(mvs, refs_arr, xs.reshape(-1), ys.reshape(-1), bs, fme, np)
    idx = 0
    for y in range(0, h, bs):
        for x in range(0, w, bs):
            mvt = tuple(int(v) for v in mvs[idx])
            scale = 2 if fme else 1
            res = enc.calculate_inter_frame_residual(x * scale, y * scale, mvt, cur[y : y + bs, x : x + bs], refs, bs)
            want_pred = cur[y : y + bs, x : x + bs] - res
            assert np.array_equal(pred[idx].astype(np.float64), want_pred), (x, y, mvt)
            idx += 1


def test_intra_search_matches_reference(ref_modules):
    Encoder, _ = ref_modules
    h, w, bs, sr = 48, 64, 16, 4
    enc = make_codec(Encoder, h, w, sr=sr)
    rng = np.random.default_rng(4)
    cur = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    canvas_w = 352
    out = I.intra_search_mode0(cur.astype(np.int32), bs, sr, canvas_w, vbs=True, xp=np)
    res_full, res_quads = I.intra_residuals_mode0(
        cur.astype(np.int32), out["mv"], out["sub_mv"], bs, np
    )
    # replicate the reference's sequential progression with its own function
    ref_frame = np.ones((288, 352)) * 128.0  # Encoder.py:1248 hardcoded canvas
    idx = 0
    s = bs // 2
    for y in range(0, h, bs):
        for x in range(0, w, bs):
            r, c = y // bs, x // bs
            if x != 0 and y != 0:  # VBS quads (searched before parent update)
                qi = 0
                for y_vbs in range(y, y + bs, s):
                    for x_vbs in range(x, x + bs, s):
                        blk = cur[y_vbs : y_vbs + s, x_vbs : x_vbs + s]
                        mv_q, mae_q, res_q = enc.intra_find_best_match_horizontal(blk, ref_frame, x_vbs, y_vbs, s, sr)
                        assert out["sub_mv"][r, c, qi] == mv_q, (x, y, qi)
                        assert out["sub_sad"][r, c, qi] / (s * s) == mae_q
                        assert np.array_equal(res_quads[idx, qi].astype(np.float64), res_q)
                        qi += 1
            blk = cur[y : y + bs, x : x + bs]
            mv_f, mae_f, res_f = enc.intra_find_best_match_horizontal(blk, ref_frame, x, y, bs, sr)
            assert out["mv"][r, c] == mv_f, (x, y, out["mv"][r, c], mv_f)
            assert out["sad"][r, c] / (bs * bs) == mae_f
            assert np.array_equal(res_full[idx].astype(np.float64), res_f)
            # the reference's in-search update: lossless residual => ref=cur
            ref_frame[y : y + bs, x : x + bs] = ref_frame[y : y + bs, x + mv_f : x + mv_f + bs] + res_f if x != 0 else np.ones((bs, bs)) * 128 + res_f
            idx += 1
    # causal-mask equivalence held implicitly: the updated region equals cur
    assert np.array_equal(ref_frame[:h, :w], cur)


def test_jax_primitives_match_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    cur = rng.integers(0, 256, size=(48, 64)).astype(np.int32)
    ref = rng.integers(0, 256, size=(48, 64)).astype(np.int32)
    up_np = M.fme_upsample(ref, np)
    up_jx = np.asarray(M.fme_upsample(jnp.asarray(ref), jnp))
    assert np.array_equal(up_np, up_jx)
    m_np = M.sad_maps(cur, up_np, 6, 8, 2, np)
    m_jx = np.asarray(M.sad_maps(jnp.asarray(cur), jnp.asarray(up_np), 6, 8, 2, jnp))
    assert np.array_equal(m_np, m_jx)
    o_np = I.intra_search_mode0(cur, 16, 4, 352, True, np)
    o_jx = I.intra_search_mode0(jnp.asarray(cur), 16, 4, 352, True, jnp)
    for k in o_np:
        assert np.array_equal(o_np[k], np.asarray(o_jx[k])), k
