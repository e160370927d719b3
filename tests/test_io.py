"""Video I/O & color pipeline: value parity with the live reference
(video_manager.py) on random 4:2:0 data — round-1 VERDICT item 7 (this file
makes PARITY.md's test_io citation real)."""
import sys
from pathlib import Path

import numpy as np
import pytest

from streamoptima_tpu.io.video import VideoManager

from conftest import REFERENCE, reference_available


@pytest.fixture(scope="module")
def ref_vm():
    if not reference_available():
        pytest.skip("reference codebase not available")
    shim = str(Path(__file__).parent / "ref_shims")
    for p in (shim, str(REFERENCE)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import video_manager

    return video_manager


def _random_420(h, w, frames, seed=0):
    rng = np.random.default_rng(seed)
    fsz = h * w * 3 // 2
    return rng.integers(0, 256, size=frames * fsz, dtype=np.uint8).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(32, 48), (64, 64)])
def test_upsample_and_rgb_match_reference(ref_vm, tmp_path, h, w):
    # the reference's 4:2:0 loader hardcodes frames=21 (video_manager.py:62,
    # called without the frames arg at :26) — generate exactly 21 frames
    frames = 21
    raw = _random_420(h, w, frames, seed=h + w)
    f = tmp_path / "clip.yuv"
    raw.tofile(f)

    ref = ref_vm.Video_Manager(str(f), h, w, frames, "yuv_420")
    ref.upscale_yuv420_to_yuv444()
    ref_rgb = ref.convert_yuv444_to_rgb(replace=True)
    ref_y = ref.vid_frames_yuv444[:, 0, :, :]

    vm = VideoManager(str(f), h, w, frames, "yuv_420")
    yuv444 = vm.upscale_yuv420_to_yuv444()
    rgb = vm.convert_yuv444_to_rgb()
    y = vm.extract_y_only()

    np.testing.assert_array_equal(np.asarray(yuv444), np.asarray(ref.vid_frames_yuv444))
    np.testing.assert_array_equal(rgb, np.asarray(ref_rgb))
    np.testing.assert_array_equal(y, np.asarray(ref_y))


def test_rgb_edge_values_match_reference(ref_vm, tmp_path):
    """Every (Y, U, V) combination on the clip boundaries — the float32 vs
    float64 matmul difference the round-1 review flagged shows up exactly at
    values that land near the 0/255 clip edges."""
    vals = np.array([0, 15, 16, 17, 127, 128, 200, 235, 236, 240, 241, 255], dtype=np.uint8)
    g = np.stack(np.meshgrid(vals, vals, vals, indexing="ij"), axis=-1).reshape(-1, 3)
    n = g.shape[0]
    # pack as a single-frame 4:4:4 clip of width n, height 1... the reference
    # reader wants (frames, 3, h, w); build via its yuv_444 path
    h, w = 12, n // 12
    assert h * w == n
    planes = g.T.reshape(3, h, w).astype(np.uint8)
    raw = planes.reshape(-1)
    f = tmp_path / "edge.yuv"
    raw.tofile(f)

    # the reference's 444 constructor hardcodes frames=300 and leaves
    # v_yuv444 False (video_manager.py:32-33); assemble the object by hand
    ref = object.__new__(ref_vm.Video_Manager)
    ref.h_pixels, ref.w_pixels, ref.frames = h, w, 1
    ref.v_yuv420, ref.v_yuv444, ref.v_rgb = False, True, False
    ref.vid_frames_yuv444 = ref_vm.Video_Manager.raw_yuv444_to_frame_arr(str(f), h, w, frames=1)
    ref.num_y_p_yuv_444 = ref.num_u_p_yuv_444 = ref.num_v_p_yuv_444 = h * w
    ref_rgb = ref.convert_yuv444_to_rgb(replace=True)

    vm = VideoManager(str(f), h, w, 1, "yuv_444")
    rgb = vm.convert_yuv444_to_rgb()
    np.testing.assert_array_equal(rgb, np.asarray(ref_rgb))
