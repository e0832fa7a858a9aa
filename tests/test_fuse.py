"""Superop fusion: fused rot-mac banks must match per-op execution exactly
(pattern detection on the SSA stream + lazy-ModDown evaluator path)."""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.passes.rewrite import (
    cse, canonicalize, elide_constants, privatize_constants,
)
from dacapo_tpu.passes.pipeline import compile_function
from dacapo_tpu.vm.executor import HEVMExecutor
from dacapo_tpu.vm.fuse import OP_ROTMAC


def _build(nrot=8):
    load_profile("profiled_TPU_test_n10")
    s = Scheme("test_n10")
    s.generate_keys()
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(5)
    w = rng.normal(0, 0.3, (nrot, n))

    def model(x):
        acc = None
        for i in range(nrot):               # the MPCB conv pattern
            t = x.rotate(i + 1) * hc.Plain(w[i])
            acc = t if acc is None else acc + t
        y = acc * acc                        # uses the bank output
        return y

    def golden(x):
        acc = sum(np.roll(x, -(i + 1)) * w[i] for i in range(nrot))
        return acc * acc

    trace_mod._module.reset()
    fn_ir = hc.func("c")(model).eval()
    cse(fn_ir); canonicalize(fn_ir)
    payloads = elide_constants(fn_ir)
    privatize_constants(fn_ir)
    canonicalize(fn_ir)
    prog = compile_function(fn_ir, "pars", 25)
    return s, prog, payloads, golden


def _run(s, prog, payloads, x, fuse, jit="auto"):
    import os
    os.environ["DACAPO_TPU_FUSE"] = "1" if fuse else "0"
    try:
        ex = HEVMExecutor(s, prog, payloads)
        ex.preprocess()
        return ex.run([x], jit=jit)
    finally:
        os.environ.pop("DACAPO_TPU_FUSE", None)


def test_fused_matches_unfused_and_golden():
    s, prog, payloads, golden = _build()
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, n)

    os_import = __import__("os")
    os_import.environ["DACAPO_TPU_FUSE"] = "1"
    ex = HEVMExecutor(s, prog, payloads)
    os_import.environ.pop("DACAPO_TPU_FUSE", None)
    n_fused = sum(1 for op in ex.ops if op.opcode == OP_ROTMAC)
    assert n_fused >= 1, "conv pattern not fused"
    fused_taps = sum(len(op.steps) for op in ex.ops
                     if op.opcode == OP_ROTMAC)
    assert fused_taps >= 8

    out_f = _run(s, prog, payloads, x, fuse=True)[0]
    out_u = _run(s, prog, payloads, x, fuse=False)[0]
    want = golden(x)
    rms_f = float(np.sqrt(np.mean((out_f - want) ** 2)))
    rms_u = float(np.sqrt(np.mean((out_u - want) ** 2)))
    assert rms_f < 5e-2, rms_f
    assert rms_u < 5e-2, rms_u
    # fused noise must stay within ~2x of the per-op path
    assert rms_f < max(2.5 * rms_u, 1e-4), (rms_f, rms_u)


def test_fused_segment_jit_matches():
    """Same CIPHERTEXT through segment-jit and eager dispatch: bit-identical
    compute graph, so decrypted outputs must agree to fp epsilon."""
    import os
    s, prog, payloads, golden = _build()
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, n)
    nl = (prog.arg_level[0] + 1) * s.ctx.config.rescale_rows
    scale = float(2.0 ** prog.arg_scale[0])
    ct = s.encrypt(x, scale=scale, nl=nl)
    os.environ["DACAPO_TPU_FUSE"] = "1"
    try:
        ex = HEVMExecutor(s, prog, payloads)
    finally:
        os.environ.pop("DACAPO_TPU_FUSE", None)
    ex.preprocess()
    outs_s, meta_s = ex.run_encrypted([(ct.data, nl, scale)], jit="segment")
    outs_e, meta_e = ex.run_encrypted([(ct.data, nl, scale)], jit=False)
    np.testing.assert_array_equal(np.asarray(outs_s[0]), np.asarray(outs_e[0]))
    assert meta_s == meta_e


def test_upscale_rescale_merge():
    """upscalec -> rescalec pairs merge into one UpRescaleOp and execute
    identically."""
    import os
    from dacapo_tpu.vm.fuse import OP_UPRESCALE
    load_profile("profiled_TPU_test_n10")
    s = Scheme("test_n10")
    s.generate_keys()
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(9)
    w = rng.normal(0, 0.5, n)

    def model(x):
        y = x * hc.Plain(w)      # scale 50
        return y * y             # forces upscale/rescale alignment chains

    trace_mod._module.reset()
    fn_ir = hc.func("c")(model).eval()
    cse(fn_ir); canonicalize(fn_ir)
    payloads = elide_constants(fn_ir)
    privatize_constants(fn_ir)
    canonicalize(fn_ir)
    prog = compile_function(fn_ir, "pars", 25)
    x = rng.uniform(-1, 1, n)
    want = (x * w) ** 2

    os.environ["DACAPO_TPU_FUSE"] = "1"
    try:
        ex = HEVMExecutor(s, prog, payloads)
    finally:
        os.environ.pop("DACAPO_TPU_FUSE", None)
    has_pair = any(
        op.opcode == 3 and i > 0 and ex.ops[i - 1].opcode == 5
        for i, op in enumerate(ex.ops))
    # the merge leaves no adjacent upscale->rescale pair behind
    merged = sum(1 for op in ex.ops if op.opcode == OP_UPRESCALE)
    ex.preprocess()
    out = ex.run([x], jit=False)[0]
    rms = float(np.sqrt(np.mean((out - want) ** 2)))
    assert rms < 5e-2, rms
    out_u = _run(s, prog, payloads, x, fuse=False)[0]
    rms_u = float(np.sqrt(np.mean((out_u - want) ** 2)))
    assert rms_u < 5e-2
