"""precompile_segments: ahead-of-run compilation of segment windows must
produce the same results as the lazy path and must not crash on programs
with eager tails / bootstrap windows."""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.params import COMPILER_PROFILES
from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.models.mlp import mlp_forward, mlp_plain, gen_weights, make_input
from dacapo_tpu.passes.rewrite import (
    cse, canonicalize, elide_constants, privatize_constants,
)
from dacapo_tpu.passes.pipeline import compile_function
from dacapo_tpu.vm.executor import HEVMExecutor

PROFILE = "test_n11"


@pytest.mark.slow
def test_precompile_matches_lazy():
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
    k = ex.precompile_segments()
    assert k >= 1                      # MLP has at least one jitted window
    # precompiled struct fns must be reused by the real run (no re-build)
    n_structs = len(ex._seg_fns)

    x = make_input()
    out = ex.run([x])[0][:10]
    assert len(ex._seg_fns) == n_structs, "run rebuilt precompiled structs"
    want = mlp_plain(x, weights)
    r = float(np.sqrt(np.mean((out - want) ** 2)))
    assert r < 5e-3, f"MLP rms {r}"
