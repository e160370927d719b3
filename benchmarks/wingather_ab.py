"""A/B of window_gather formulations on the real chip.

The fast-ME rowscan is dominated by the one-hot window fetch
(core/fastme.window_gather): measured 6.27 ms/sweep + 3.83 ms confirm
fetch at 720p VBS+FME (benchmarks/fastme_probe.py).  The cost model that
fits the measurements is MEMORY, not MACs: the (nb, P, H, nwin) f32
column-select intermediate is written+read per call (confirm at 720p FME:
~0.76 GB of traffic for 3.83 ms ~= 200 GB/s effective), which is also why
the chunked/banded restructure regressed 2.1x — its intermediate was
band=32 wide instead of nwin=18.

Variants (all bit-exact: one-hot selects of integers <= 255 are exact in
bf16, and each output element is a single product):

* flat_f32   — the shipping code (f32 intermediate)
* flat_bf16  — same two einsums with bf16 intermediates (half the traffic)
* gather     — no intermediate: one XLA gather with OOB -> fill(0)
               (jnp.take mode='fill'), flat (row*W + col) indices with
               invalid lanes forced out of range

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/wingather_ab.py
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.phase_probe2 import chain_time


def flat_f32(planes, by0, bx0, nwin):
    from streamoptima_tpu.core import fastme as FM
    return FM.window_gather(planes, by0, bx0, nwin, jnp)


def flat_bf16(planes, by0, bx0, nwin):
    P, H, W = planes.shape
    jj = bx0[:, None] + jnp.arange(nwin)[None, :]
    cs = (jj[:, None, :] == jnp.arange(W)[None, :, None]).astype(jnp.bfloat16)
    colf = jnp.einsum("phw,bwj->bphj", planes, cs,
                      preferred_element_type=jnp.bfloat16)
    ii = by0[:, None] + jnp.arange(nwin)[None, :]
    rs = (ii[:, :, None] == jnp.arange(H)[None, None, :]).astype(jnp.bfloat16)
    win = jnp.einsum("bih,bphj->bpij", rs, colf,
                     preferred_element_type=jnp.float32)
    return win.astype(jnp.int32)


def take_gather(planes, by0, bx0, nwin):
    P, H, W = planes.shape
    rows = by0[:, None] + jnp.arange(nwin)[None, :]          # (nb, i)
    cols = bx0[:, None] + jnp.arange(nwin)[None, :]          # (nb, j)
    ok = ((rows >= 0) & (rows < H))[:, :, None] & ((cols >= 0) & (cols < W))[:, None, :]
    # OOB marker must be PAST the end: negative indices wrap in fill mode
    idx = jnp.where(ok, rows[:, :, None] * W + cols[:, None, :], H * W)
    flat = planes.reshape(P, H * W)
    win = jnp.take(flat, idx, axis=1, mode="fill", fill_value=0)  # (P, nb, i, j)
    return win.transpose(1, 0, 2, 3).astype(jnp.int32)


def main():
    h, w, nref, fme = 720, 1280, 1, True
    P = nref * 4 if fme else nref
    nwin = 18
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, 256, (P, h, w)), jnp.bfloat16)
    print(f"planes {planes.shape} nwin={nwin}", flush=True)

    from streamoptima_tpu.core import me_pallas as MP

    interp = jax.default_backend() != "tpu"
    prep = MP.window_prep(planes, nwin)

    def pallas_fetch(planes_, by0, bx0, nwin_):
        return MP.window_fetch(prep, by0, bx0, nwin_, interpret=interp)

    variants = [("flat_f32", flat_f32), ("flat_bf16", flat_bf16),
                ("gather", take_gather), ("pallas_fetch", pallas_fetch)]

    # value parity first (on whatever backend we're on)
    nb = 200
    by0 = jnp.asarray(rng.integers(-30, h + 10, nb), jnp.int32)
    bx0 = jnp.asarray(rng.integers(-30, w + 10, nb), jnp.int32)
    ref = np.asarray(flat_f32(planes, by0, bx0, nwin))
    for name, fn in variants[1:]:
        got = np.asarray(fn(planes, by0, bx0, nwin))
        assert np.array_equal(ref, got), f"{name} mismatch"
    print("parity OK", flush=True)

    for nb, tag in ((45, "sweep-step nb=45"), (3600, "confirm nb=3600")):
        by_a = jnp.asarray(rng.integers(-20, h, nb), jnp.int32)
        bx_a = jnp.asarray(rng.integers(-20, w, nb), jnp.int32)
        by_b = jnp.asarray(rng.integers(-20, h, nb), jnp.int32)
        bx_b = jnp.asarray(rng.integers(-20, w, nb), jnp.int32)
        print(f"--- {tag} ---", flush=True)
        for name, fn in variants:
            t = chain_time(f"{name} {tag}",
                           lambda x, fn=fn: fn(planes, x[0], x[1], nwin),
                           (by_a, bx_a), (by_b, bx_b),
                           n=24 if nb == 45 else 6)
            del t


if __name__ == "__main__":
    main()
