"""Composite (prime-pair) rescale: the 32-bit-limb answer to SEAL's 60-bit
scale exactness (params.CKKSConfig.rescale_rows, primes.gen_balanced_pairs).

The single-prime chain drifts the scale by |q/2^30 - 1| ~ 1% per rescale (no
NTT prime at N >= 2^14 sits closer to 2^30), which breaks addcc operand
matching in deep programs. Balanced pairs hold |log2(q_a*q_b) - 60| under
1e-4, so the compiler's integer-bit scale model matches the runtime scale to
SEAL-class precision.
"""

import math

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.primes import gen_balanced_pairs
from dacapo_tpu.crypto.scheme import Scheme

PROFILE = "test_n11c"


def test_balanced_pairs_quality():
    ch = gen_balanced_pairs(1 << 11, 6, 30)
    assert len(set(ch)) == 12
    for k in range(6):
        a, b = ch[2 * k], ch[2 * k + 1]
        assert a < (1 << 31) and b < (1 << 31)
        assert abs(math.log2(a * b) - 60) < 5e-4, (a, b)


@pytest.fixture(scope="module")
def scheme():
    s = Scheme(PROFILE)
    s.generate_keys(rot_steps=(1, 3))
    return s


def test_rescale_divides_by_pair(scheme):
    s = scheme
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, n)
    ct = s.encrypt(v)                      # scale 2^40, 12 rows
    m = s.mul(ct, ct)                      # scale 2^80
    r = s.rescale(m)                       # drop pair -> scale ~2^20... no: 80-60=20
    assert r.nl == s.ctx.config.num_q - 2
    # exact runtime scale within 1e-4 bits of the integer model
    assert abs(math.log2(r.scale) - 20) < 1e-3
    out = s.decrypt(r)
    rms = float(np.sqrt(np.mean((out - v * v) ** 2)))
    assert rms < 5e-3, rms


def test_deep_chain_scale_drift(scheme):
    """12 rows = 6 levels: chain muls down the whole chain; cumulative scale
    drift vs the integer model stays ~1e-4 bits per level."""
    s = scheme
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, n)
    w = rng.uniform(0.85, 1.15, n)    # keep |message| << bottom-pair modulus
    ct = s.encrypt(v)
    want = v.copy()
    model_bits = 40
    # PARS-style: mul at +40 bits, rescale (-60) once scale >= wl + rf = 100
    for _ in range(2 * (s.ctx.config.num_levels - 1)):
        ct = s.mul_pt(ct, s.encode(w, scale=2.0 ** 40, nl=ct.nl))
        want = want * w
        model_bits += 40
        if model_bits >= 100:
            ct = s.rescale(ct)
            model_bits -= 60
        drift = abs(math.log2(ct.scale) - model_bits)
        assert drift < 2e-3, drift
        if ct.nl <= 4:
            break
    out = s.decrypt(ct)
    rms = float(np.sqrt(np.mean((out - want) ** 2)))
    assert rms < 5e-3, rms


def test_vm_pipeline_composite(tmp_path):
    """Trace -> PARS -> execute on a composite profile; adds after divergent
    rescale paths must still decode correctly (the original drift bug)."""
    from examples.common import trace_and_save, compile_traced, run_test

    d = str(tmp_path)
    rng = np.random.default_rng(7)
    n = 1024
    w = rng.normal(0, 0.5, n)

    def body(x):
        a = (x * hc.Plain(w)) * x            # two muls -> rescales
        b = x.rotate(1) + x                  # shallow path
        c = a + b * hc.Plain(w)              # join paths at different depths
        return c * c

    trace_and_save("Comp", "c", body, dirs=d)
    x = rng.uniform(-1, 1, n)
    a = (x * w) * x
    b = np.roll(x, -1) + x
    c = a + b * w
    want = c * c
    res, lat, rms = run_test("Comp", "pars", 40, PROFILE, [x], want,
                             traced_dir=d, out_dir=d)
    assert rms < 5e-3, rms


def test_emulated_bootstrap_composite(tmp_path):
    """dacapo pipeline with bootstraps on a composite profile: deep chain
    beyond the level budget, RMS must survive the emulated bootstraps."""
    from examples.common import trace_and_save, run_test

    d = str(tmp_path)
    rng = np.random.default_rng(9)
    n = 1024
    w = rng.uniform(0.9, 1.1, n)

    def body(x):
        acc = x
        for i in range(9):                  # depth 9 > 6 levels
            acc = acc * hc.Plain(w)
            if i % 3 == 2:
                acc = acc + x.rotate(1)
        return acc

    trace_and_save("DeepC", "c", body, dirs=d)
    x = rng.uniform(-1, 1, n)
    want = x.copy()
    for i in range(9):
        want = want * w
        if i % 3 == 2:
            want = want + np.roll(x, -1)
    res, lat, rms = run_test("DeepC", "dacapo", 40, PROFILE, [x], want,
                             traced_dir=d, out_dir=d)
    assert rms < 5e-3, rms
