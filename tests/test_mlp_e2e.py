"""MLP end-to-end: the reference hc-trace + hopt pars + hc-test flow
(README.md:176-190 semantics) on a small-but-real parameter set."""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.params import COMPILER_PROFILES
from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.models.mlp import mlp_forward, mlp_plain, gen_weights, make_input
from dacapo_tpu.passes.rewrite import cse, canonicalize, elide_constants, privatize_constants
from dacapo_tpu.passes.pipeline import compile_function
from dacapo_tpu.vm.executor import HEVMExecutor

PROFILE = "test_n11"   # N=2048, 1024 slots >= the 800-slot MLP packing


@pytest.mark.slow
def test_mlp_pars_e2e():
    load_profile(COMPILER_PROFILES[PROFILE])
    s = Scheme(PROFILE)
    s.generate_keys()

    weights = gen_weights()
    trace_mod._module.reset()
    f = hc.func("c")(lambda image: mlp_forward(image, weights))
    fn = f.eval()
    fn.name = "MLP"
    cse(fn)
    canonicalize(fn)
    payloads = elide_constants(fn)
    privatize_constants(fn)
    canonicalize(fn)

    prog = compile_function(fn, "pars", 25)
    ex = HEVMExecutor(s, prog, payloads)
    ex.preprocess()

    x = make_input()
    out = ex.run([x])[0][:10]
    want = mlp_plain(x, weights)
    r = float(np.sqrt(np.mean((out - want) ** 2)))
    # reference achieves ~9.5e-4 at N=2^15/Delta=2^60 (README.md:189); our
    # 30-bit-prime small profile targets the same order of magnitude
    assert r < 5e-3, f"MLP rms {r}"
