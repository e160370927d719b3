"""Native (C++) host runtime: entropy coding + bitstream serialization.

Compiled lazily with g++ on first import (cached .so keyed on source mtime);
every caller must handle ``available() == False`` and fall back to the Python
twins in core/zigzag.py / bitstream.py — output is byte-identical either way
(tested in tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "entropy.cpp"
_LIB = None
_TRIED = False


def _build_lib() -> Path | None:
    cache_dir = Path(os.environ.get("STREAMOPTIMA_NATIVE_CACHE", tempfile.gettempdir())) / "streamoptima_native"
    cache_dir.mkdir(parents=True, exist_ok=True)
    so = cache_dir / f"entropy_{int(_SRC.stat().st_mtime)}.so"
    if so.exists():
        return so
    tmp = so.with_suffix(".so.build")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(tmp, so)
    return so


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build_lib()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.encode_residual_line.restype = ctypes.c_int64
    lib.encode_residual_line.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.rle_encode_blocks.restype = ctypes.c_int64
    lib.rle_encode_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.rle_decode_blocks.restype = None
    lib.rle_decode_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def encode_residual_line(qtc_full, qtc_quads, split, numpy_repr: bool) -> str | None:
    """Serialize one frame's residual text line from device-shaped arrays.

    qtc_full (nb, bs, bs), qtc_quads (nb, 4, sbs, sbs), split (nb,) bool.
    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    qf = np.ascontiguousarray(np.asarray(qtc_full), dtype=np.int64)
    qq = np.ascontiguousarray(np.asarray(qtc_quads), dtype=np.int64)
    sp = np.ascontiguousarray(np.asarray(split), dtype=np.uint8)
    nb, bs = qf.shape[0], qf.shape[-1]
    # worst case: every coefficient its own run, 25 bytes/value with np.int64()
    cap = int(nb * (2 * bs * bs * 25 + 16) + 16)
    buf = ctypes.create_string_buffer(cap)
    n = lib.encode_residual_line(
        qf.ctypes.data, qq.ctypes.data, sp.ctypes.data,
        ctypes.c_int64(nb), ctypes.c_int32(bs), ctypes.c_int32(1 if numpy_repr else 0),
        buf, ctypes.c_int64(cap),
    )
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def rle_encode_blocks(blocks) -> tuple[np.ndarray, np.ndarray] | None:
    """Batch RLE: (values concatenated, offsets (nblocks+1,))."""
    lib = _load()
    if lib is None:
        return None
    b = np.ascontiguousarray(np.asarray(blocks), dtype=np.int64)
    nblocks, n = b.shape[0], b.shape[-1]
    out = np.empty(nblocks * (2 * n * n + 1), dtype=np.int64)
    offs = np.empty(nblocks + 1, dtype=np.int64)
    total = lib.rle_encode_blocks(b.ctypes.data, ctypes.c_int64(nblocks), ctypes.c_int32(n), out.ctypes.data, offs.ctypes.data)
    return out[:total].copy(), offs


def rle_decode_blocks(data, offsets, n: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(np.asarray(data), dtype=np.int64)
    offs = np.ascontiguousarray(np.asarray(offsets), dtype=np.int64)
    nblocks = len(offs) - 1
    out = np.empty((nblocks, n, n), dtype=np.int64)
    lib.rle_decode_blocks(d.ctypes.data, offs.ctypes.data, ctypes.c_int64(nblocks), ctypes.c_int32(n), out.ctypes.data)
    return out
