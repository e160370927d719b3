"""Pallas full-search kernel: bit parity with the NumPy oracle (interpret
mode on CPU; the same checks run compiled on TPU in the bench driver)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamoptima_tpu.core import me as M
from streamoptima_tpu.core.me_pallas import full_search_pallas


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
    "h,w,sr,nref,nvalid",
    [
        (64, 128, 4, 1, None),
        (64, 128, 8, 2, 1),
    ],
)
def test_pallas_fme_matches_oracle(h, w, sr, nref, nvalid):
    """Half-pel (parity-plane) kernel vs the XLA oracle at double range."""
    rng = np.random.default_rng(h + sr)
    from streamoptima_tpu.core.me_pallas import full_search_pallas_fme

    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    ups = np.stack([
        M.fme_upsample(rng.integers(0, 256, (h, w)).astype(np.int32), np) for _ in range(nref)
    ])
    a = M.full_search_materialized(cur, ups, 2 * sr, 16, 8, 2, True, True, np, nvalid=nvalid)
    b = full_search_pallas_fme(
        jnp.asarray(cur), jnp.asarray(ups), sr, 16, 8, True,
        nvalid=None if nvalid is None else jnp.int32(nvalid), interpret=True,
    )
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)
