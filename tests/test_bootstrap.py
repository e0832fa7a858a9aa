"""Native CKKS bootstrapping: ModRaise -> CoeffToSlot -> EvalMod -> SlotToCoeff.

This is the capability the reference licenses out to HEaaN
(lib/Runtime/HEAAN_HEVM.cpp:386-399 `bootstrapper->bootstrap`); the SEAL build
only ships a decrypt/re-encrypt emulation. Here the real pipeline is checked
end-to-end on a tiny sparse-secret profile: encrypt at the bottom of the
modulus chain, bootstrap back up, decrypt, compare slots.
"""

import numpy as np
import pytest

from dacapo_tpu.crypto.scheme import Scheme, Ciphertext
from dacapo_tpu.crypto.bootstrap_native import BootstrapConfig

PROFILE = "test_boot"


@pytest.fixture(scope="module")
def scheme():
    s = Scheme(PROFILE)
    s.generate_keys()
    return s


@pytest.fixture(scope="module")
def bs(scheme):
    return scheme.enable_native_bootstrap(BootstrapConfig(K=16, r=3, degree=36, baby=8))


def test_mod_raise_roundtrip(scheme, bs):
    """ModRaise of a fresh level-1 ciphertext decrypts to m + I*q0 with
    |I| <= K under the sparse secret."""
    n = scheme.ctx.config.n_slots
    rng = np.random.default_rng(7)
    vals = rng.uniform(-1, 1, n)
    delta = 2.0 ** scheme.ctx.config.scale_bits
    ct = scheme.encrypt(vals, scale=delta, nl=1)
    m_low = scheme.encoder.crt_lift(scheme.decrypt_planes(ct))   # m mod q0, centered
    raised = bs.mod_raise(ct.data, 1)
    # coefficient-domain residue: c = m + I*q0 with I integral, |I| <= K
    c_full = scheme.encoder.crt_lift(
        scheme.decrypt_planes(Ciphertext(raised, delta)))
    q0 = scheme.ctx.q_primes[0]
    I = (c_full - m_low) / q0
    assert np.max(np.abs(I - np.round(I))) < 1e-3            # integral
    assert np.max(np.abs(I)) < bs.cfg.K, np.max(np.abs(I))   # in EvalMod range


def test_bootstrap_end_to_end(scheme, bs):
    n = scheme.ctx.config.n_slots
    rng = np.random.default_rng(3)
    vals = rng.uniform(-1, 1, n)
    delta = 2.0 ** scheme.ctx.config.scale_bits
    ct = scheme.encrypt(vals, scale=delta, nl=2)

    target_level = 1
    data, (nl2, scale2) = bs.bootstrap(ct.data, ct.nl, ct.scale, target_level)
    assert nl2 == target_level + 1

    got = scheme.decrypt(Ciphertext(data, scale2))
    err = got - vals
    rms = float(np.sqrt(np.mean(err * err)))
    # precision is INPUT-noise limited: a fresh test_boot encryption at
    # Delta=2^25 already decrypts at rms ~1.2e-4; the composite-pair
    # pipeline (pair CRT raise + 2^60 working scale) adds no measurable
    # error on top (measured identical rms with/without the bootstrap)
    assert rms < 5e-4, rms
    assert np.max(np.abs(err)) < 5e-3, np.max(np.abs(err))


def test_bootstrap_in_executor(scheme, bs):
    """The executor dispatches earth.bootstrap to the native path when
    enable_native_bootstrap was called (vm/executor.py _bootstrap)."""
    from dacapo_tpu.crypto.bootstrap import Bootstrapper
    from dacapo_tpu.crypto.bootstrap_native import NativeBootstrapper
    assert isinstance(Bootstrapper(scheme), NativeBootstrapper)


def test_device_oracle_batch_matches_single():
    """The device-resident emulated oracle: batch path == per-row path
    (same lift/re-encrypt semantics) on a composite (rescale_rows=2)
    profile, where the lift runs from the bottom prime PAIR."""
    from dacapo_tpu.crypto.bootstrap import EmulatedBootstrapper

    s = Scheme("test_n11c")
    s.generate_keys()
    bs = EmulatedBootstrapper(s)
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(5)
    delta = 2.0 ** s.ctx.config.scale_bits
    vals = rng.uniform(-1, 1, (3, n))
    cts = np.stack([np.asarray(s.encrypt(v, scale=delta, nl=2).data)
                    for v in vals])

    target = 3
    out_b, (nl2, sc) = bs.bootstrap_batch(cts, 2, delta, target)
    assert nl2 == (target + 1) * s.ctx.config.rescale_rows
    for i, v in enumerate(vals):
        got = s.decrypt(Ciphertext(out_b[i], sc))
        rms = float(np.sqrt(np.mean((got - v) ** 2)))
        assert rms < 5e-4, (i, rms)
        single, (nl1, sc1) = bs.bootstrap(cts[i], 2, delta, target)
        assert nl1 == nl2
        got1 = s.decrypt(Ciphertext(single, sc1))
        rms1 = float(np.sqrt(np.mean((got1 - v) ** 2)))
        assert rms1 < 5e-4, (i, rms1)


def test_device_oracle_hot_input_scale_preserving():
    """Flagship r4 regression: the planner normalizes every bootstrap input
    to scale 2^rf (~2^60 on composite profiles, passes/scale.py "bootstrap"
    hook), which always triggers the oracle's cooling rescales. The oracle
    must REHEAT after the CRT lift and return the ORIGINAL scale —
    scale-preserving, like the reference SEAL oracle re-encoding at the
    input scale (SEAL_HEVM.cpp:324-334) and like _meta_step's OP_BOOTSTRAP
    prediction (vm/executor.py) — or every precompiled segment downstream
    decodes with a scale off by the cooled factor (~2^30): exactly the
    rms-1.0-at-first-bootstrap collapse in _logs/window_probe_r4.log."""
    from dacapo_tpu.crypto.bootstrap import EmulatedBootstrapper

    s = Scheme("test_n11c")
    s.generate_keys()
    bs = EmulatedBootstrapper(s)
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(11)
    vals = rng.uniform(-1, 1, (2, n))
    hot = 2.0 ** 60                       # = 2^rf, the planner-normal scale
    nl_in = 6                             # mid-chain, room to cool
    cts = np.stack([np.asarray(s.encrypt(v, scale=hot, nl=nl_in).data)
                    for v in vals])

    target = 5
    out_b, (nl2, sc) = bs.bootstrap_batch(cts, nl_in, hot, target)
    assert sc == hot, (sc, hot)           # exact scale preservation
    assert nl2 == (target + 1) * s.ctx.config.rescale_rows
    for i, v in enumerate(vals):
        got = s.decrypt(Ciphertext(out_b[i], sc))
        rms = float(np.sqrt(np.mean((got - v) ** 2)))
        assert rms < 5e-4, (i, rms)
    single, (nl1, sc1) = bs.bootstrap(cts[0], nl_in, hot, target)
    assert sc1 == hot and nl1 == nl2
    got1 = s.decrypt(Ciphertext(single, sc1))
    assert float(np.sqrt(np.mean((got1 - vals[0]) ** 2))) < 5e-4
