import numpy as np
import jax.numpy as jnp
import pytest

from dacapo_tpu.crypto.params import CKKSContext, CKKSConfig
from dacapo_tpu.crypto.ops import Evaluator


@pytest.fixture(scope="module")
def ctx():
    return CKKSContext(CKKSConfig(n=256, num_q=6, alpha=3, prime_bits=30))


@pytest.fixture(scope="module")
def ev(ctx):
    return Evaluator(ctx)


def _rand_planes(ctx, rows, seed=0):
    rng = np.random.default_rng(seed)
    qs = np.array([ctx.primes[r] for r in rows], dtype=np.uint64)
    return rng.integers(0, qs[:, None], size=(len(rows), ctx.n)).astype(np.uint32)


def naive_negacyclic_mul(a, b, q):
    """Exact negacyclic convolution via python ints (test oracle)."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            p = ai * int(b[j])
            if k < n:
                out[k] = (out[k] + p) % q
            else:
                out[k - n] = (out[k - n] - p) % q
    return np.array(out, dtype=np.uint32)


def test_roundtrip(ctx, ev):
    rows = list(range(6))
    x = _rand_planes(ctx, rows)
    y = np.asarray(ev.intt(ev.ntt(jnp.asarray(x), rows), rows))
    np.testing.assert_array_equal(x, y)


def test_convolution_theorem(ctx, ev):
    """intt(ntt(a) ⊙ ntt(b)) must equal the negacyclic product a*b mod (X^N+1)."""
    rows = [0, 3]
    a = _rand_planes(ctx, rows, seed=1)
    b = _rand_planes(ctx, rows, seed=2)
    fa = ev.ntt(jnp.asarray(a), rows)
    fb = ev.ntt(jnp.asarray(b), rows)
    from dacapo_tpu.crypto.modmath import mul_mod
    prod = mul_mod(fa, fb, *ev._mm_consts(rows))
    got = np.asarray(ev.intt(prod, rows))
    for i, r in enumerate(rows):
        want = naive_negacyclic_mul(a[i], b[i], ctx.primes[r])
        np.testing.assert_array_equal(got[i], want)


def test_eval_exps_are_odd_and_distinct(ctx):
    e = ctx.eval_exps
    assert np.all(e % 2 == 1)
    assert len(set(e.tolist())) == ctx.n


def test_decode_plain_matches_host_encode():
    """Compact device decode == host residue encode, incl. the >2^62 path."""
    import jax.numpy as jnp
    from dacapo_tpu.crypto.params import CKKSContext, PROFILES
    from dacapo_tpu.crypto.encoding import Encoder
    from dacapo_tpu.crypto.ops import Evaluator

    ctx = CKKSContext(PROFILES["test_n11c"])
    enc = Encoder(ctx)
    ev = Evaluator(ctx)
    rng = np.random.default_rng(4)
    vals = [rng.uniform(-1, 1, ctx.config.n_slots), rng.uniform(-3, 3, 32)]
    scales = [2.0 ** 40, 2.0 ** 95]          # small + bigscale paths
    rows = list(range(6)) + [ctx.config.num_q, ctx.config.num_q + 1]
    compact = enc.encode_compact_batch(vals, scales)
    got = np.asarray(ev.decode_plain(jnp.asarray(compact), rows))
    for i, (v, s) in enumerate(zip(vals, scales)):
        res = enc._rns_residues(enc._raw_coeffs(v) * s, 0,
                                primes=[ctx.primes[r] for r in rows])
        want = np.asarray(ev.ntt(jnp.asarray(res), rows))
        assert np.array_equal(got[i], want), f"mismatch item {i}"
