"""Bit-exact vectorized host engine (NumPy + SciPy transforms).

Replicates the reference Y_Video_codec / decoder pair output-for-output
(Encoder.py, decoder.py) using the vectorized primitives in core/ plus scipy
transforms, including every quirk in COMPAT_NOTES.md.  Used for golden-parity
testing and as the oracle for the native JAX engine; it is itself ~100x
faster than the reference's per-block Python loops.
"""
from __future__ import annotations

import numpy as np

from streamoptima_tpu import rc as rc_mod
from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.core import blocks as B
from streamoptima_tpu.core import intra as I
from streamoptima_tpu.core import me as M
from streamoptima_tpu.core import pred as P
from streamoptima_tpu.core.quant import qpm1, quantize, rescale
from streamoptima_tpu.core.transform import dct2_scipy, idct2_scipy
from streamoptima_tpu.core.zigzag import rle_length
from streamoptima_tpu import metrics


class CompatCodec:
    """Host encoder/decoder, bit-exact with the NumPy reference."""

    def __init__(self, cfg: CodecConfig, y_frames: np.ndarray):
        assert cfg.compat, "CompatCodec requires engine='compat'"
        if cfg.intra_mode != 0:
            raise NotImplementedError("intra_mode=1 is unrunnable in the reference (bug B2)")
        self.cfg = cfg
        self.y = np.asarray(y_frames)
        self.h, self.w = cfg.height, cfg.width
        self.bs = cfg.block_size
        self.sbs = cfg.sub_block_size
        self.nbr, self.nbc = cfg.block_rows, cfg.blocks_per_row
        self.nb = self.nbr * self.nbc
        ys, xs = np.meshgrid(np.arange(self.nbr) * self.bs, np.arange(self.nbc) * self.bs, indexing="ij")
        self.bx = xs.reshape(-1)
        self.by = ys.reshape(-1)
        self.vbs_eligible = (self.bx != 0) & (self.by != 0)
        self._row_qps = rc_mod.row_qp_sequence(cfg) if cfg.rc_active else None

    # ------------------------------------------------------------- helpers
    def _sr_eff(self):
        return self.cfg.search_range * 2 if self.cfg.fme_enable else self.cfg.search_range

    def _block_qps(self, qp_per_row):
        """Per-block QP vector from per-row values (or constant)."""
        if qp_per_row:
            return np.repeat(np.asarray(qp_per_row, dtype=np.int64), self.nbc)
        return np.full(self.nb, self.cfg.qp, dtype=np.int64)

    def _quad_coords(self):
        offs = np.array([[0, 0], [0, 1], [1, 0], [1, 1]]) * self.sbs  # (dr, dc)
        qx = self.bx[:, None] + offs[None, :, 1]
        qy = self.by[:, None] + offs[None, :, 0]
        return qx, qy

    # ------------------------------------------------------- motion search
    def _full_search(self, cur, refs_arr, fme):
        """Full search for all blocks and quads; returns mv/sad (+sub)."""
        cfg = self.cfg
        sr = self._sr_eff()
        scale = 2 if fme else 1
        H, W = refs_arr.shape[-2:]
        maps = np.stack([M.sad_maps(cur, r, sr, self.sbs, scale, np) for r in refs_arr])
        nref, ndy, ndx = maps.shape[:3]
        nbr2, nbc2 = maps.shape[3:]
        # full-block SADs: quadrant sums
        full = maps.reshape(nref, ndy, ndx, nbr2 // 2, 2, nbc2 // 2, 2).sum(axis=(4, 6)).reshape(nref, ndy, ndx, -1)
        vmask = M.candidate_valid_mask(self.bx * scale, self.by * scale, sr, self.bs, H, W, fme, np)
        mv, sad, ok = M.argmin_displacement(full, np.broadcast_to(vmask, full.shape), sr, True, np)
        mae = np.where(ok, sad / (self.bs * self.bs), np.inf)
        out = {"mv": mv, "mae": mae}
        if cfg.vbs_enable:
            qx, qy = self._quad_coords()
            # map quads to the sub-grid: (nb, 4) sub-block flat index
            qidx = (qy // self.sbs) * nbc2 + (qx // self.sbs)
            sub = maps.reshape(nref, ndy, ndx, -1)[:, :, :, qidx.reshape(-1)]
            vsub = M.candidate_valid_mask(
                (qx.reshape(-1) * scale), (qy.reshape(-1) * scale), sr, self.sbs, H, W, fme, np
            )
            smv, ssad, sok = M.argmin_displacement(sub, np.broadcast_to(vsub, sub.shape), sr, True, np)
            out["sub_mv"] = smv.reshape(self.nb, 4, 3)
            out["sub_mae"] = np.where(sok, ssad / (self.sbs * self.sbs), np.inf).reshape(self.nb, 4)
        return out

    def _fast_search_block(self, cur_blk, refs_arr, X, Y, n, mvp, fme):
        """Twin of fast_motion_estimation (Encoder.py:719-742): returns
        (mv, best_ref_idx) - the ref index in the MAE slot (quirk K6)."""
        H, W = refs_arr.shape[-2:]
        best = None  # (sad, order) -> strict improvement only (no tie-break)
        best_mv = tuple(int(v) for v in mvp)
        best_ref = 0
        for ref_i in range(min(len(refs_arr), self.cfg.n_ref_frames)):
            rf = refs_arr[ref_i]
            for dx in range(mvp[0] - 1, mvp[0] + 2):
                for dy in range(mvp[1] - 1, mvp[1] + 2):
                    if not (0 <= X + dx < W - n and 0 <= Y + dy < H - n):
                        continue
                    if not (0 <= X + dx + 2 * n < W - n and 0 <= Y + dy + 2 * n < H - n):
                        continue  # quirk K7: applied even without FME
                    if fme:
                        win = rf[Y + dy : Y + dy + 2 * n : 2, X + dx : X + dx + 2 * n : 2]
                    else:
                        win = rf[Y + dy : Y + dy + n, X + dx : X + dx + n]
                    sad = int(np.abs(cur_blk - win).sum())
                    if best is None or sad < best:
                        best = sad
                        best_mv = (dx, dy, ref_i)
                        best_ref = ref_i
        return best_mv, best_ref

    def _fast_search(self, cur, refs_arr, fme, per_block_zero_mvp):
        """Sequential fast-ME chain over blocks (Encoder.py:549-581) or the
        mode-2 per-block variant with mvp=(0,0,0) (Encoder.py:641-642)."""
        cfg = self.cfg
        scale = 2 if fme else 1
        cur_b = B.blockify(cur.astype(np.int64), self.bs)
        mvp = (0, 0, 0)
        mv = np.zeros((self.nb, 3), dtype=np.int32)
        mae = np.zeros(self.nb)
        sub_mv = np.zeros((self.nb, 4, 3), dtype=np.int32) if cfg.vbs_enable else None
        sub_mae = np.zeros((self.nb, 4)) if cfg.vbs_enable else None
        qx, qy = self._quad_coords() if cfg.vbs_enable else (None, None)
        for i in range(self.nb):
            if per_block_zero_mvp:
                mvp = (0, 0, 0)
            if cfg.vbs_enable and self.vbs_eligible[i]:
                for q in range(4):
                    cq = cur.astype(np.int64)[qy[i, q] : qy[i, q] + self.sbs, qx[i, q] : qx[i, q] + self.sbs]
                    m, r = self._fast_search_block(cq, refs_arr, qx[i, q] * scale, qy[i, q] * scale, self.sbs, mvp, fme)
                    sub_mv[i, q] = m
                    sub_mae[i, q] = r  # quirk K6: ref idx in the MAE slot
            m, r = self._fast_search_block(cur_b[i], refs_arr, self.bx[i] * scale, self.by[i] * scale, self.bs, mvp, fme)
            mv[i] = m
            mae[i] = r
            if not per_block_zero_mvp:
                mvp = tuple(int(v) for v in m)
        out = {"mv": mv, "mae": mae}
        if cfg.vbs_enable:
            out["sub_mv"] = sub_mv
            out["sub_mae"] = sub_mae
        return out

    # ------------------------------------------------------------ RD costs
    def _rd_split_decision(self, res_full, res_quads, mae_full, mae_quads, frame_type):
        """Twin of the VBS RD comparison (Encoder.py:564-575, :1133-1158).
        Uses the constant initial QP (RC only kicks in later; Encoder.py:1844).
        Returns split bool mask (nb,) plus vbs_mae per block."""
        cfg = self.cfg
        qp = cfg.qp
        lam = cfg.lam
        qtc_full = quantize(dct2_scipy(res_full), qp)
        len_full = rle_length(qtc_full)
        qtc_sub = quantize(dct2_scipy(res_quads), qpm1(qp))
        len_sub = rle_length(qtc_sub).sum(axis=1)
        base = 8 if frame_type == 0 else 16
        base_vbs = 32 if frame_type == 0 else 64
        bits_bs = base + 8 * len_full
        bits_vbs = base_vbs + 8 * len_sub
        vbs_mae = mae_quads.sum(axis=1) / 4.0
        rd_bs = lam * bits_bs + mae_full
        rd_vbs = lam * bits_vbs + vbs_mae
        split = ~(rd_bs < rd_vbs) & self.vbs_eligible
        return split, vbs_mae

    # --------------------------------------------------------- inter flow
    def _inter_flow(self, frame, ref_frames):
        """Twin of complete_inter_flow (Encoder.py:1644-1709)."""
        cfg = self.cfg
        fme = cfg.fme_enable
        refs_arr = np.stack([np.asarray(r, dtype=np.int32) for r in ref_frames])
        search_refs = (
            np.stack([M.fme_upsample(np.asarray(r), np) for r in ref_frames]) if fme else refs_arr
        )
        cur = frame.astype(np.int32)
        use_fast = cfg.fast_me and cfg.parallel_mode != 1
        if use_fast:
            s = self._fast_search(cur, search_refs, fme, per_block_zero_mvp=(cfg.parallel_mode == 2))
        else:
            s = self._full_search(cur, search_refs, fme)
        mv = s["mv"]
        cur_blocks = B.blockify(cur, self.bs).astype(np.int64)
        pred_full = P.gather_predictions(mv, search_refs, self.bx, self.by, self.bs, fme, np)
        res_full = cur_blocks - pred_full
        split = np.zeros(self.nb, dtype=bool)
        res_quads = None
        if cfg.vbs_enable:
            qx, qy = self._quad_coords()
            smv = s["sub_mv"].reshape(-1, 3)
            pred_q = P.gather_predictions(smv, search_refs, qx.reshape(-1), qy.reshape(-1), self.sbs, fme, np)
            cur_q = B.split_quads(B.blockify(cur, self.bs), self.bs).astype(np.int64)
            res_quads = cur_q - pred_q.reshape(self.nb, 4, self.sbs, self.sbs)
            split, vbs_mae = self._rd_split_decision(res_full, res_quads, s["mae"], s["sub_mae"], frame_type=1)
            mae_per_block = np.where(self.vbs_eligible, vbs_mae, s["mae"])
        else:
            mae_per_block = s["mae"]
        average_mae = mae_per_block.sum() / self.nb

        mvs_list = []
        for i in range(self.nb):
            if split[i]:
                mvs_list.append((1, [tuple(int(v) for v in s["sub_mv"][i, q]) for q in range(4)]))
            else:
                mvs_list.append((0, tuple(int(v) for v in mv[i])))

        qblocks, qp_per_row, size = self._quant_stage(res_full, res_quads, split)
        recon = self._reconstruct_inter(mvs_list, ref_frames, qblocks, qp_per_row)
        return mvs_list, average_mae, qblocks, qp_per_row, recon, size

    def _quant_stage(self, res_full, res_quads, split):
        """DCT+quantize chosen residuals with per-row RC QPs; collect sizes
        (Encoder.py:1665-1697 / :1597-1628)."""
        cfg = self.cfg
        qp_per_row = self._row_qps[:] if cfg.rc_active else []
        qps = self._block_qps(qp_per_row)
        tf = quantize(dct2_scipy(res_full), qps)
        lens_full = rle_length(tf)
        if res_quads is not None:
            tq = quantize(dct2_scipy(res_quads), np.vectorize(qpm1)(qps)[:, None])
            lens_quads = rle_length(tq).sum(axis=1)
        size = int(np.where(split, lens_quads, lens_full).sum()) if res_quads is not None else int(lens_full.sum())
        qblocks = []
        for i in range(self.nb):
            if split[i]:
                qblocks.append((1, [tq[i, q] for q in range(4)]))
            else:
                qblocks.append((0, tf[i]))
        return qblocks, qp_per_row, size

    def _dequant_blocks(self, qblocks, qp_per_row):
        """Rescale+IDCT every block (split-aware, per-row QP)."""
        qps = self._block_qps(qp_per_row)
        full_idx = [i for i, b in enumerate(qblocks) if b[0] == 0]
        quad_idx = [i for i, b in enumerate(qblocks) if b[0] == 1]
        out_full = {}
        if full_idx:
            arr = np.stack([np.asarray(qblocks[i][1]) for i in full_idx])
            res = idct2_scipy(rescale(arr, qps[full_idx]))
            out_full = dict(zip(full_idx, res))
        out_quads = {}
        if quad_idx:
            arr = np.stack([np.stack(qblocks[i][1]) for i in quad_idx])
            qv = np.vectorize(qpm1)(qps[quad_idx])
            res = idct2_scipy(rescale(arr, qv[:, None]))
            out_quads = dict(zip(quad_idx, res))
        return out_full, out_quads

    def _reconstruct_inter(self, mvs_list, ref_frames, qblocks, qp_per_row):
        """Twin of reconstruct_frame (Encoder.py:831-932) == decode_frame_inter."""
        cfg = self.cfg
        fme = cfg.fme_enable
        refs_arr = np.stack([np.asarray(r, dtype=np.int32) for r in ref_frames])
        pred_refs = (
            np.stack([M.fme_upsample(np.asarray(r), np) for r in ref_frames]) if fme else refs_arr
        )
        out_full, out_quads = self._dequant_blocks(qblocks, qp_per_row)
        mv_arr = np.zeros((self.nb, 3), dtype=np.int32)
        smv_arr = np.zeros((self.nb, 4, 3), dtype=np.int32)
        split = np.zeros(self.nb, dtype=bool)
        for i, (sp, mv) in enumerate(mvs_list):
            if sp == 0:
                mv_arr[i] = mv
            else:
                split[i] = True
                smv_arr[i] = np.asarray(mv)
        pred_full = P.gather_predictions(mv_arr, pred_refs, self.bx, self.by, self.bs, fme, np)
        qx, qy = self._quad_coords()
        pred_q = P.gather_predictions(
            smv_arr.reshape(-1, 3), pred_refs, qx.reshape(-1), qy.reshape(-1), self.sbs, fme, np,
            fme_margin=self.bs,  # reconstruction-path quirk (see gather_predictions)
        ).reshape(self.nb, 4, self.sbs, self.sbs)
        blocks_out = np.zeros((self.nb, self.bs, self.bs), dtype=np.uint8)
        for i in range(self.nb):
            if not split[i]:
                blocks_out[i] = P.wrap_uint8(pred_full[i] + out_full[i], np)
            else:
                quad = np.zeros((4, self.sbs, self.sbs), dtype=np.uint8)
                for q in range(4):
                    quad[q] = P.wrap_uint8(pred_q[i, q] + out_quads[i][q], np)
                blocks_out[i] = B.merge_quads(quad[None], self.bs)[0]
        return B.unblockify(blocks_out, self.h, self.w)

    # --------------------------------------------------------- intra flow
    def _intra_flow(self, frame):
        """Twin of complete_intra_flow (Encoder.py:1582-1642)."""
        cfg = self.cfg
        cur = frame.astype(np.int32)
        canvas_h, canvas_w = cfg.intra_canvas
        sr = cfg.search_range
        out = I.intra_search_mode0(cur, self.bs, sr, canvas_w, cfg.vbs_enable, np)
        res_full, res_quads = I.intra_residuals_mode0(
            cur, out["mv"], out.get("sub_mv"), self.bs, np
        )
        res_full = res_full.astype(np.int64)
        mae_full = out["sad"].reshape(-1) / (self.bs * self.bs)
        split = np.zeros(self.nb, dtype=bool)
        if cfg.vbs_enable:
            res_quads = res_quads.astype(np.int64)
            mae_quads = out["sub_sad"].reshape(self.nb, 4) / (self.sbs * self.sbs)
            split, vbs_mae = self._rd_split_decision(res_full, res_quads, mae_full, mae_quads, frame_type=0)
            mae_per_block = np.where(self.vbs_eligible, vbs_mae, mae_full)
        else:
            mae_per_block = mae_full
        average_mae = mae_per_block.sum() / self.nb

        mv_flat = out["mv"].reshape(-1)
        smv_flat = out["sub_mv"].reshape(self.nb, 4) if cfg.vbs_enable else None
        mvs_list = []
        for i in range(self.nb):
            if split[i]:
                mvs_list.append((1, [int(smv_flat[i, q]) for q in range(4)]))
            else:
                mvs_list.append((0, int(mv_flat[i])))

        qblocks, qp_per_row, size = self._quant_stage(res_full, res_quads if cfg.vbs_enable else None, split)
        recon = self._reconstruct_intra(mvs_list, qblocks, qp_per_row)
        return mvs_list, average_mae, qblocks, qp_per_row, recon, size

    def _reconstruct_intra(self, mvs_list, qblocks, qp_per_row):
        """Twin of reconstruct_frame_intra (Encoder.py:1350-1417) ==
        decode_frame_intra (decoder.py:330-432), mode 0."""
        out_full, out_quads = self._dequant_blocks(qblocks, qp_per_row)
        rf = np.zeros((self.nb, self.bs, self.bs), dtype=np.int64)
        rq = np.zeros((self.nb, 4, self.sbs, self.sbs), dtype=np.int64)
        split = np.zeros(self.nb, dtype=bool)
        mv = np.zeros(self.nb, dtype=np.int64)
        smv = np.zeros((self.nb, 4), dtype=np.int64)
        for i, (sp, m) in enumerate(mvs_list):
            if sp == 0:
                rf[i] = out_full[i]
                mv[i] = m
            else:
                split[i] = True
                rq[i] = np.stack(out_quads[i])
                smv[i] = np.asarray(m)
        frame = I.intra_reconstruct_mode0(rf, rq, split, mv, smv, self.h, self.w, self.bs, np)
        return (frame & 255).astype(np.uint8)

    # -------------------------------------------------------------- encode
    def encode(self):
        cfg = self.cfg
        frame_types = []
        mvs_per_frame = []
        mae_per_frame = []
        qblocks_per_frame = []
        qp_rows_per_frame = []
        recons = []
        psnrs = []
        ssims = []
        ref_frames = [np.ones((self.h, self.w)) * 128]
        for i in range(cfg.frames):
            frame = B.pad_hw(self.y[i], self.h, self.w, self.bs)
            if i % cfg.intra_dur == 0 and cfg.parallel_mode != 1:
                mvs, mae, qb, qpr, recon, size = self._intra_flow(frame)
                ftype = 0
            else:
                if cfg.parallel_mode == 1 or cfg.parallel_mode == 3:
                    refs_use = [np.ones((self.h, self.w)) * 128]
                else:
                    refs_use = ref_frames
                mvs, mae, qb, qpr, recon, size = self._inter_flow(frame, refs_use)
                ftype = 1
                if cfg.rc_flag is not None and cfg.rc_flag > 1 and size > cfg.intra_thresh:
                    mvs, mae, qb, qpr, recon, size = self._intra_flow(frame)
                    ftype = 0
            frame_types.append(ftype)
            mvs_per_frame.append(mvs)
            mae_per_frame.append(mae)
            qblocks_per_frame.append(qb)
            qp_rows_per_frame.append(qpr)
            recons.append(recon)
            if i < cfg.frames - 1:
                if ftype == 0:
                    ref_frames = []  # decoder-aligned reset (fix B3; no-op for nRef=1)
                if len(ref_frames) >= cfg.n_ref_frames:
                    ref_frames.pop(0)
                ref_frames.append(recon)
            psnrs.append(metrics.psnr(self.y[i], recon))
            ssims.append(metrics.ssim(self.y[i], recon))
        package = {
            "block size": self.bs,
            "num frames": cfg.frames,
            "height in pixels": self.h,
            "width in pixels": self.w,
            "search range": cfg.search_range,
            "PSNR per frame": psnrs,
            "SSIM per frame": ssims,
            "MAE per Frame": mae_per_frame,
            "MVS per Frame": mvs_per_frame,
            "approx residual": qblocks_per_frame,
            "Qp_per_row_per_frame": qp_rows_per_frame,
            "frame_type_seq": frame_types,
            "reconstructed frames": np.stack(recons),
        }
        return package

    # -------------------------------------------------------------- decode
    def decode(self, frame_types, qblocks_per_frame, qp_rows_per_frame, mvs_per_frame):
        """Twin of decoder.decode (decoder.py:487-545)."""
        cfg = self.cfg
        ref_frames = [np.ones((self.h, self.w)) * 128]
        out = []
        if cfg.parallel_mode == 1:
            for i in range(cfg.frames):
                f = self._reconstruct_inter(mvs_per_frame[i], ref_frames, qblocks_per_frame[i], qp_rows_per_frame[i])
                out.append(f)
            return out
        for i in range(cfg.frames):
            if frame_types[i] == 0:
                f = self._reconstruct_intra(mvs_per_frame[i], qblocks_per_frame[i], qp_rows_per_frame[i])
                ref_frames = []
            else:
                if cfg.parallel_mode == 3:
                    ref_frames = [np.ones((self.h, self.w)) * 128]
                f = self._reconstruct_inter(mvs_per_frame[i], ref_frames, qblocks_per_frame[i], qp_rows_per_frame[i])
            out.append(f)
            if i < cfg.frames - 1:
                if len(ref_frames) >= cfg.n_ref_frames:
                    ref_frames.pop(0)
                ref_frames.append(f)
        return out
