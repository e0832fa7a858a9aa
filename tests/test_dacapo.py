"""DaCapo planner end-to-end: deep trace -> automatic bootstrap placement ->
execution with the (insecure, reference-parity) emulated bootstrapper.

Mirrors `hbt dacapo <wl> <Bench>` + `hc-test` (SURVEY.md §3.2-3.3).
"""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.params import COMPILER_PROFILES
from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.passes.rewrite import cse, canonicalize, elide_constants, privatize_constants
from dacapo_tpu.passes.pipeline import compile_function
from dacapo_tpu.passes.dacapo import CandidateAnalysis, remove_bootstrap
from dacapo_tpu.vm.executor import HEVMExecutor
from dacapo_tpu.vm.hevm import OP_BOOTSTRAP

PROFILE = "test_n10"


@pytest.fixture(scope="module")
def scheme():
    load_profile(COMPILER_PROFILES[PROFILE])
    s = Scheme(PROFILE)
    s.generate_keys()
    return s


def _trace(body, n_args=1):
    trace_mod._module.reset()
    f = hc.func(",".join(["c"] * n_args))(body)
    fn = f.eval()
    cse(fn)
    canonicalize(fn)
    payloads = elide_constants(fn)
    privatize_constants(fn)
    canonicalize(fn)
    return fn, payloads


def _deep_body(n_slots, depth=10):
    mask = np.full(n_slots, 0.9)

    def body(x):
        y = x
        for i in range(depth):
            y = y * x                      # burn a level each time
            y = y + y.rotate(1 + i)        # SMU-crossing edges
            y = y * hc.Plain(mask)
        return y

    return body


def _golden(x, depth=10):
    y = x.copy()
    for i in range(depth):
        y = y * x
        y = y + np.roll(y, -(1 + i))
        y = y * 0.9
    return y


def test_candidate_analysis(scheme):
    fn, _ = _trace(_deep_body(scheme.ctx.config.n_slots))
    remove_bootstrap(fn)
    ca = CandidateAnalysis(fn)
    assert len(ca.edges) > 3
    assert ca.ret_opid == len(ca.values) - 1
    # live-outs at edges are nonempty and sorted subsets of opids
    some = [e for e in ca.edges if e > 0][:3]
    for e in some:
        lo = ca.values[e].live_outs
        assert lo and all(0 < o <= e for o in lo)


def test_dacapo_places_bootstraps_and_runs(scheme):
    n = scheme.ctx.config.n_slots
    depth = 10
    fn, payloads = _trace(_deep_body(n, depth))
    prog = compile_function(fn, "dacapo", 25)
    n_boot = sum(1 for op in prog.ops if op.opcode == OP_BOOTSTRAP)
    assert n_boot > 0, "deep circuit must need bootstrapping"

    ex = HEVMExecutor(scheme, prog, payloads)
    ex.preprocess()
    x = np.random.default_rng(0).uniform(0.4, 0.9, n)
    out = ex.run([x])[0]
    want = _golden(x, depth)
    r = float(np.sqrt(np.mean((out - want) ** 2)))
    assert r < 5e-2, f"rms {r} (values {np.abs(want).max():.2f})"


def test_pars_fails_on_deep_circuit(scheme):
    """Without bootstrapping the same circuit must be infeasible — the
    type-inference failure the reference uses as its probe."""
    from dacapo_tpu.passes.scale import TypeInferenceError
    fn, _ = _trace(_deep_body(scheme.ctx.config.n_slots))
    with pytest.raises(TypeInferenceError):
        compile_function(fn, "pars", 25)
