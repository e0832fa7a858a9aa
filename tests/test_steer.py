"""Scale steering (vm/steer.py): the composite-prime-pair drift fix.

The tpu-class profiles emulate one 60-bit rescale with a PAIR of ~30-bit
primes whose product is 2^60*(1+delta), |delta| up to ~4e-5
(crypto/primes.py gen_balanced_pairs). Forced-scale adds then mix operands
whose TRUE scales drifted apart -> silent relative error (measured 1.85e-2
RMS on the flagship ResNet artifact before the fix). The steering solver
chooses plaintext encode scales and integer upscale multipliers so add
operands match exactly.
"""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.params import COMPILER_PROFILES, PROFILES
from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.passes.pipeline import compile_function
from dacapo_tpu.passes.rewrite import (
    cse, canonicalize, elide_constants, privatize_constants,
)
from dacapo_tpu.vm.executor import HEVMExecutor
from dacapo_tpu.vm.simulate import simulate
from dacapo_tpu.vm.steer import solve_steering, steer_scales

PROFILE = "test_n11c"        # composite rescale_rows=2 profile


def _compile(model, waterline=25):
    load_profile(COMPILER_PROFILES[PROFILE])
    trace_mod._module.reset()
    fn_ir = hc.func("c")(model).eval()
    cse(fn_ir)
    canonicalize(fn_ir)
    payloads = elide_constants(fn_ir)
    privatize_constants(fn_ir)
    canonicalize(fn_ir)
    prog = compile_function(fn_ir, "pars", waterline)
    return prog, payloads


def _drifty_model(w1, w2, b1):
    """Two mul/rescale paths of different depth joined by adds — the shape
    that exposes pair drift (paths divide by different prime subsets)."""
    def model(x):
        a = x * hc.Plain(w1)               # mul+rescale path
        a = a * hc.Plain(w2)
        b = x * hc.Plain(w2)
        c = a + b                          # add: operands differ in history
        d = c * c                          # ct-ct square
        return d + hc.Plain(b1)
    return model


@pytest.fixture(scope="module")
def scheme():
    s = Scheme(PROFILE)
    s.generate_keys()
    return s


def test_solver_zeroes_adds(scheme):
    rng = np.random.default_rng(3)
    n = scheme.ctx.config.n_slots
    prog, payloads = _compile(
        _drifty_model(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      rng.uniform(-1, 1, n)))
    q = [int(v) for v in scheme.ctx.q_primes]
    plan = solve_steering(prog, q, scheme.ctx.config.rescale_rows)
    assert plan.max_forced < 1e-8, plan.forced
    ex = steer_scales(prog, q, scheme.ctx.config.rescale_rows)
    # with the solver active, at least one plaintext departs from 2^bits
    assert ex.up_k or any(
        abs(np.log2(s) - round(np.log2(s))) > 0 for s in ex.enc_scale.values())


def test_simulated_drift_shrinks(scheme):
    rng = np.random.default_rng(4)
    n = scheme.ctx.config.n_slots
    w1, w2, b1 = (rng.uniform(-1, 1, n) for _ in range(3))
    prog, payloads = _compile(_drifty_model(w1, w2, b1))
    x = rng.uniform(-1, 1, n)
    want = (x * w1 * w2 + x * w2) ** 2 + b1

    def rms(res):
        return float(np.sqrt(np.mean((res.outputs[0][0][:n] - want) ** 2)))

    plain = simulate(prog, payloads, [x], PROFILE, steer=False)
    steered = simulate(prog, payloads, [x], PROFILE, steer="global")
    assert rms(steered) <= rms(plain)
    assert not steered.scale_mismatches
    assert rms(steered) < 1e-9      # float sim: steering leaves no drift


def test_encrypted_run_matches(scheme):
    """End-to-end: executor with steering ON matches the golden model."""
    rng = np.random.default_rng(5)
    n = scheme.ctx.config.n_slots
    w1, w2, b1 = (rng.uniform(-1, 1, n) for _ in range(3))
    prog, payloads = _compile(_drifty_model(w1, w2, b1))
    ex = HEVMExecutor(scheme, prog, payloads)
    ex.preprocess()
    x = rng.uniform(-1, 1, n)
    data = scheme.encrypt(
        x, scale=float(2.0 ** prog.arg_scale[0]),
        nl=(prog.arg_level[0] + 1) * ex.rr)
    outs, meta = ex.run_encrypted(
        [(data.data, (prog.arg_level[0] + 1) * ex.rr,
          float(2.0 ** prog.arg_scale[0]))])
    from dacapo_tpu.crypto.scheme import Ciphertext
    got = scheme.decrypt(Ciphertext(outs[0], meta[0][1]))[:n]
    want = (x * w1 * w2 + x * w2) ** 2 + b1
    err = float(np.sqrt(np.mean((got - want) ** 2)))
    assert err < 5e-4, err
    # the upscale K-multipliers must be active on this composite profile
    assert ex._steer is not None
