"""End-to-end: trace -> scale management -> lower -> HEVM -> execute -> RMS.

Mirrors the reference hc-trace + hecate-opt + hc-test flow
(SURVEY.md §3.1-3.3) on small parameters.
"""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.params import PROFILES, COMPILER_PROFILES
from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.passes.pipeline import compile_function
from dacapo_tpu.vm.executor import HEVMExecutor
from dacapo_tpu.vm.hevm import HEVMProgram
from dacapo_tpu.ir.serialize import read_cst


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
    from dacapo_tpu.passes.rewrite import cse, canonicalize, elide_constants, privatize_constants
    cse(fn)
    canonicalize(fn)
    payloads = elide_constants(fn)
    privatize_constants(fn)
    canonicalize(fn)
    return fn, payloads


def _run(scheme, fn, payloads, args, pipeline="pars", waterline=25):
    prog = compile_function(fn, pipeline, waterline)
    ex = HEVMExecutor(scheme, prog, payloads)
    ex.preprocess()
    return ex.run(args, jit=True), prog


def rms(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    n = min(a.shape[-1], b.shape[-1]) if a.ndim and b.ndim else None
    d = a.ravel()[: len(b.ravel())] - b.ravel()
    return float(np.sqrt(np.mean(d * d)))


def test_poly_eval(scheme):
    """(x*x + x) * c + 1  — exercises mulcc, mulcp, addcp, rescale chain."""
    c = np.linspace(0.1, 0.9, scheme.ctx.config.n_slots)

    def body(x):
        y = x * x + x
        return y * hc.Plain(c) + 1.0

    fn, payloads = _trace(body)
    x = np.random.default_rng(0).uniform(-1, 1, scheme.ctx.config.n_slots)
    (out,), prog = _run(scheme, fn, payloads, [x])
    want = (x * x + x) * c + 1.0
    assert rms(out, want) < 2e-3, rms(out, want)


def test_rotation_reduce(scheme):
    """Rotate-and-add reduction plus plaintext mask (MPCB SumSlots shape)."""
    n = scheme.ctx.config.n_slots
    mask = np.zeros(n); mask[:4] = 1.0

    def body(x):
        acc = x
        for k in (1, 2, 4):
            acc = acc + acc.rotate(k)
        return acc * hc.Plain(mask)

    fn, payloads = _trace(body)
    x = np.random.default_rng(1).uniform(-1, 1, n)
    (out,), prog = _run(scheme, fn, payloads, [x])
    acc = x.copy()
    for k in (1, 2, 4):
        acc = acc + np.roll(acc, -k)
    want = acc * mask
    assert rms(out, want) < 2e-3, rms(out, want)


def test_eva_pipeline(scheme):
    def body(x):
        return x * x * hc.Plain(np.full(scheme.ctx.config.n_slots, 0.5))

    fn, payloads = _trace(body)
    x = np.random.default_rng(2).uniform(-1, 1, scheme.ctx.config.n_slots)
    (out,), prog = _run(scheme, fn, payloads, [x], pipeline="eva")
    want = x * x * 0.5
    assert rms(out, want) < 2e-3, rms(out, want)


def test_deep_chain_pars(scheme):
    """Depth-4 multiply chain — PARS must insert upscales+rescales."""
    n = scheme.ctx.config.n_slots

    def body(x):
        y = x
        for _ in range(4):
            y = y * x
        return y

    fn, payloads = _trace(body)
    x = np.random.default_rng(3).uniform(0.3, 1.0, n)
    (out,), prog = _run(scheme, fn, payloads, [x])
    want = x ** 5
    assert rms(out, want) < 5e-3, rms(out, want)


def test_hevm_roundtrip(tmp_path, scheme):
    def body(x):
        return x * x

    fn, payloads = _trace(body)
    prog = compile_function(fn, "pars", 25)
    p = tmp_path / "t.hevm"
    prog.save(str(p))
    prog2 = HEVMProgram.load(str(p))
    assert len(prog2.ops) == len(prog.ops)
    assert prog2.res_dst == prog.res_dst
    assert prog2.arg_scale == prog.arg_scale
    assert [o.opcode for o in prog2.ops] == [o.opcode for o in prog.ops]


def test_negate_sub(scheme):
    n = scheme.ctx.config.n_slots

    def body(x):
        return (1.0 - x) * hc.Plain(np.full(n, 2.0))

    fn, payloads = _trace(body)
    x = np.random.default_rng(4).uniform(-1, 1, n)
    (out,), prog = _run(scheme, fn, payloads, [x])
    want = (1.0 - x) * 2.0
    assert rms(out, want) < 2e-3, rms(out, want)
