import numpy as np
import jax.numpy as jnp

from dacapo_tpu.crypto import modmath as mm


RNG = np.random.default_rng(0)
Q = 2**30 - 2**18 + 1  # an NTT-friendly-ish 30-bit prime (1073479681)


def _rand_u32(n, high=2**32):
    return RNG.integers(0, high, size=n, dtype=np.uint64).astype(np.uint32)


def test_mulhi_u32():
    a = _rand_u32(1000)
    b = _rand_u32(1000)
    got = np.asarray(mm.mulhi_u32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_add_sub_neg_mod():
    q = np.uint32(Q)
    a = _rand_u32(1000, Q)
    b = _rand_u32(1000, Q)
    np.testing.assert_array_equal(
        np.asarray(mm.add_mod(jnp.asarray(a), jnp.asarray(b), q)),
        (a.astype(np.uint64) + b) % Q,
    )
    np.testing.assert_array_equal(
        np.asarray(mm.sub_mod(jnp.asarray(a), jnp.asarray(b), q)),
        (a.astype(np.int64) - b) % Q,
    )
    np.testing.assert_array_equal(
        np.asarray(mm.neg_mod(jnp.asarray(a), q)), (-a.astype(np.int64)) % Q
    )


def test_mul_mod_shoup_const():
    q = np.uint32(Q)
    a = _rand_u32(1000)  # any u32 allowed for the multiplicand
    w = int(_rand_u32(1, Q)[0])
    ws = np.uint32(mm.host_shoup(w, Q))
    got = np.asarray(mm.mul_mod_shoup(jnp.asarray(a), np.uint32(w), ws, q))
    want = (a.astype(object) * w % Q).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_mont_and_general_mulmod():
    q = np.uint32(Q)
    qinv = np.uint32(mm.host_qinv_neg(Q))
    rconst = (1 << 32) % Q
    rs = np.uint32(mm.host_shoup(rconst, Q))
    a = _rand_u32(1000, Q)
    b = _rand_u32(1000, Q)
    got = np.asarray(
        mm.mul_mod(jnp.asarray(a), jnp.asarray(b), q, qinv, np.uint32(rconst), rs)
    )
    want = (a.astype(object) * b.astype(object) % Q).astype(np.uint32)
    np.testing.assert_array_equal(got, want)
