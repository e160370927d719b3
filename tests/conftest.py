"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
paths compile and run without TPU hardware (SURVEY.md section 4).

NOTE the env image preloads jax via sitecustomize (axon TPU plugin), so
setting JAX_PLATFORMS in os.environ here is too late — the platform must be
forced through jax.config before the first backend initialization."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("MPLBACKEND", "Agg")

try:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import sys
from pathlib import Path

import numpy as np
import pytest

try:  # persistent XLA compile cache: native-engine tests are compile-heavy
    import hashlib

    import jax

    # key the cache on the host CPU's feature flags: XLA:CPU AOT entries are
    # machine-feature-specific and loading another machine's entries warns
    # (and can SIGILL) when this VM migrates hosts
    try:
        flags_line = next(l for l in open("/proc/cpuinfo") if l.startswith("flags"))
        _cpu_key = hashlib.md5(flags_line.encode()).hexdigest()[:8]
    except Exception:
        _cpu_key = "generic"
    jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_compile_cache_{_cpu_key}")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "Encoder.py").exists()


@pytest.fixture(scope="session")
def ref_modules():
    """Import the upstream NumPy reference (oracle for golden generation)."""
    if not reference_available():
        pytest.skip("reference codebase not available")
    shim = str(Path(__file__).parent / "ref_shims")
    for p in (shim, str(REFERENCE)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import Encoder  # noqa: F401
    import decoder  # noqa: F401

    return Encoder, decoder


def synthetic_clip(h=64, w=64, frames=3, seed=42, motion=1):
    """Deterministic test clip: a translating random texture (has real motion
    structure so ME/intra paths are exercised nontrivially)."""
    rng = np.random.default_rng(seed)
    pad = motion * frames + 8
    base = rng.integers(0, 256, size=(h + pad, w + pad)).astype(np.uint8)
    return np.stack([base[i * motion : i * motion + h, i * motion : i * motion + w].copy() for i in range(frames)])


def smooth_clip(h=64, w=64, frames=3, seed=7, motion=2):
    """Smoother clip (low-pass filtered) - exercises zero runs in RLE."""
    rng = np.random.default_rng(seed)
    pad = motion * frames + 16
    base = rng.integers(0, 256, size=(h + pad, w + pad)).astype(np.float64)
    k = np.ones(9) / 9.0
    for ax in (0, 1):
        base = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), ax, base)
    base = base.astype(np.uint8)
    return np.stack([base[i * motion : i * motion + h, i * motion : i * motion + w].copy() for i in range(frames)])
