"""Timing harness + viewers."""
import numpy as np

from streamoptima_tpu import profiling, viz
from streamoptima_tpu.config import CodecConfig
from streamoptima_tpu.io.video import VideoManager

from conftest import synthetic_clip


def test_time_steps_and_report():
    clip = synthetic_clip(h=64, w=64, frames=2)
    cfg = CodecConfig(height=64, width=64, frames=2, search_range=2, qp=4, intra_dur=2)
    t = profiling.time_steps(cfg, clip, warmup=1, iters=2)
    assert set(t) == {"intra_s", "inter_s", "decode_inter_s", "decode_intra_s"}
    assert all(len(v) == 2 and all(x > 0 for x in v) for v in t.values())
    rep = profiling.report(t)
    assert "intra_s" in rep and "ms" in rep


def test_viewers(tmp_path):
    clip = synthetic_clip(h=64, w=64, frames=1)
    viz.view_frame(clip[0], save=tmp_path / "f.png")
    yuv = np.stack([clip[0], np.full((64, 64), 128, np.uint8), np.full((64, 64), 128, np.uint8)])
    viz.view_frame_yuv(yuv, save=tmp_path / "yuv.png")
    vm = VideoManager(np.concatenate([clip[0].reshape(-1), np.full(64 * 64 // 2, 128, np.uint8)]), 64, 64, 1)
    vm.upscale_yuv420_to_yuv444()
    rgb = vm.convert_yuv444_to_rgb()
    viz.view_frame_rgb(rgb[0], save=tmp_path / "rgb.png")
    for f in ("f.png", "yuv.png", "rgb.png"):
        assert (tmp_path / f).stat().st_size > 0
