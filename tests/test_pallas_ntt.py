"""Fused Pallas NTT kernel vs the portable XLA NTT (interpret mode on CPU).

The kernel is the TPU hot path (auto-selected in crypto/ops.py when running
on real hardware); here it runs under the Pallas interpreter against the
portable ntt_fwd/ntt_inv reference on the same tables.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dacapo_tpu.crypto.params import CKKSContext, PROFILES
from dacapo_tpu.crypto.ntt import ntt_fwd, ntt_inv
from dacapo_tpu.crypto.pallas.ntt_kernel import PallasNTT


@pytest.fixture(scope="module")
def ctx():
    return CKKSContext(PROFILES["test_n11"])


def _portable(ctx, x, rows, inverse):
    host = ctx.host_tables
    idx = np.asarray(rows)
    q = host["q"][idx][:, None]
    if not inverse:
        return ntt_fwd(x, host["tw"][idx], host["tw_shoup"][idx], q)
    return ntt_inv(x, host["itw"][idx], host["itw_shoup"][idx], q,
                   host["ninv"][idx][:, None], host["ninv_shoup"][idx][:, None])


@pytest.mark.parametrize("inverse", [False, True])
def test_pallas_matches_portable(ctx, inverse):
    rng = np.random.default_rng(7)
    rows = [0, 2, 1, 2]                       # repeated + out-of-order primes
    qv = np.array([ctx.primes[r] for r in rows], dtype=np.uint64)
    x = (rng.integers(0, 1 << 62, (len(rows), ctx.n)) % qv[:, None]).astype(np.uint32)
    want = np.asarray(_portable(ctx, jnp.asarray(x), rows, inverse))
    pn = PallasNTT(ctx, interpret=True)
    got = np.asarray(pn(jnp.asarray(x), rows, inverse=inverse))
    np.testing.assert_array_equal(got, want)


def test_pallas_roundtrip(ctx):
    rng = np.random.default_rng(3)
    rows = [0, 1]
    qv = np.array([ctx.primes[r] for r in rows], dtype=np.uint64)
    x = (rng.integers(0, 1 << 62, (2, ctx.n)) % qv[:, None]).astype(np.uint32)
    pn = PallasNTT(ctx, interpret=True)
    y = pn(jnp.asarray(x), rows, inverse=False)
    back = np.asarray(pn(y, rows, inverse=True))
    np.testing.assert_array_equal(back, x)
