"""Large-scale encoding: waterline plans emit encode ops at 60-120 bit
scales (reference encode_internal handles these through SEAL's big-int
encoder, lib/Runtime/SEAL_HEVM.cpp:256-267); our encoder computes residues
from the float64 mantissa/exponent split instead of big ints."""

from fractions import Fraction

import numpy as np

from dacapo_tpu.crypto.params import CKKSContext, PROFILES
from dacapo_tpu.crypto.encoding import Encoder


def test_encode_decode_high_scale_roundtrip():
    ctx = CKKSContext(PROFILES["test_n10"])
    e = Encoder(ctx)
    rng = np.random.default_rng(7)
    v = rng.uniform(-1, 1, e.n_slots)
    nl = min(4, len(ctx.q_primes))
    mod_bits = sum(int(q).bit_length() for q in ctx.q_primes[:nl])
    for bits in (20, 45, 62, 80, 100):
        if bits + 2 >= mod_bits:
            continue
        planes = e.encode(v, 2.0 ** bits, nl)
        out = e.decode(planes, 2.0 ** bits)
        # rounding noise: ~0.5/coeff, sqrt(N) coeffs fold into each slot
        tol = max(1e-9, 8 * np.sqrt(e.n) / 2.0 ** bits)
        assert np.abs(out - v).max() < tol, f"scale 2^{bits}"


def test_encode_high_scale_residues_exact():
    """Every limb must hold residues of the exact integer the float64
    coefficient*scale product represents (the mantissa-shift path loses
    nothing: prod = mi * 2^k exactly)."""
    ctx = CKKSContext(PROFILES["test_n10"])
    e = Encoder(ctx)
    rng = np.random.default_rng(3)
    v = rng.uniform(-1, 1, e.n_slots)
    bits = 70
    planes = e.encode(v, 2.0 ** bits, 3)
    prod = e._raw_coeffs(v) * 2.0 ** bits
    for i in range(3):
        q = int(ctx.q_primes[i])
        want = np.array(
            [round(Fraction(float(p))) % q for p in prod], dtype=np.uint32)
        assert (planes[i] == want).all(), f"limb {i}"
