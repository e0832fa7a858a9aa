"""Native runtime core (native/hevm_core.cpp) vs the pure-Python artifact
layer: .hevm/.cst roundtrip parity, bytecode validation, and the native
register-reuse compaction preserving executor semantics."""

import numpy as np
import pytest

from dacapo_tpu.vm import native
from dacapo_tpu.vm.hevm import (
    HEVMOp, HEVMProgram, OP_ENCODE, OP_ROTATE, OP_RESCALE, OP_ADDCC,
    OP_ADDCP, OP_MULCC, OP_MULCP, OP_ALLOC,
)
from dacapo_tpu.ir.serialize import write_cst, read_cst

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native core unavailable (no g++)")


def _toy_program(reuse_done=False):
    """2 args, a small mixed stream: r2=a0*a1, r3=rot(r2), r4=r3+p0, out."""
    p = HEVMProgram()
    p.arg_scale, p.arg_level = [40, 40], [2, 2]
    p.res_scale, p.res_level, p.res_dst = [40], [4], [4]
    p.init_level = 6
    p.num_ctxt, p.num_ptxt = 5, 1
    p.ops = [
        HEVMOp(OP_ENCODE, 0, 0, (3 << 10) | 40),
        HEVMOp(OP_ALLOC), HEVMOp(OP_MULCC, 2, 0, 1),
        HEVMOp(OP_ALLOC), HEVMOp(OP_RESCALE, 3, 2),
        HEVMOp(OP_ALLOC), HEVMOp(OP_ROTATE, 4, 3, 5),
        HEVMOp(OP_ADDCP, 4, 4, 0),
    ]
    return p


def test_hevm_roundtrip_native_vs_python(tmp_path):
    p = _toy_program()
    f1, f2 = str(tmp_path / "a.hevm"), str(tmp_path / "b.hevm")
    assert native.save_program(p, f1)          # native write
    p._save_py(f2)                             # python write
    assert open(f1, "rb").read() == open(f2, "rb").read()
    ln = native.load_program(f1, HEVMProgram, HEVMOp)   # native read
    lp = HEVMProgram._load_py(f2)                        # python read
    for a, b in ((ln, p), (lp, p)):
        assert [(o.opcode, o.dst, o.lhs, o.rhs) for o in a.ops] == \
               [(o.opcode, o.dst, o.lhs, o.rhs) for o in b.ops]
        assert (a.arg_scale, a.arg_level, a.res_scale, a.res_level,
                a.res_dst, a.init_level, a.num_ctxt, a.num_ptxt) == \
               (b.arg_scale, b.arg_level, b.res_scale, b.res_level,
                b.res_dst, b.init_level, b.num_ctxt, b.num_ptxt)


def test_cst_roundtrip_native_vs_python(tmp_path):
    rng = np.random.default_rng(0)
    payloads = [rng.normal(size=n) for n in (4, 1, 257, 0)]
    f1, f2 = str(tmp_path / "a.cst"), str(tmp_path / "b.cst")
    assert native.write_cst_native(payloads, f1)
    import struct
    with open(f2, "wb") as f:                  # python writer, no native
        f.write(struct.pack("<q", len(payloads)))
        for arr in payloads:
            a = np.asarray(arr, dtype="<f8").ravel()
            f.write(struct.pack("<q", a.size))
            f.write(a.tobytes())
    assert open(f1, "rb").read() == open(f2, "rb").read()
    got = native.read_cst_native(f1)
    for g, w in zip(got, payloads):
        np.testing.assert_array_equal(g, np.asarray(w))


def test_validate_catches_malformed_streams():
    p = _toy_program()
    assert p.validate() == -1 == p._validate_py()
    bad = _toy_program()
    bad.ops[2] = HEVMOp(OP_MULCC, 2, 0, 4)     # rhs register never defined
    assert bad.validate() == 2 == bad._validate_py()
    bad2 = _toy_program()
    bad2.res_dst = [4, 9]
    bad2.res_scale, bad2.res_level = [40, 40], [4, 4]
    assert bad2.validate() == -2 == bad2._validate_py()


def test_reuse_compact_preserves_semantics():
    """A wasteful SSA stream (one fresh reg per op) compacts to fewer regs
    and still validates; dataflow is preserved under symbolic execution."""
    p = HEVMProgram()
    p.arg_scale, p.arg_level = [40], [2]
    p.init_level = 6
    n = 12
    p.num_ctxt, p.num_ptxt = 1 + n, 0
    p.ops = []
    src = 0
    for i in range(n):
        p.ops.append(HEVMOp(OP_ALLOC))
        p.ops.append(HEVMOp(OP_ROTATE, 1 + i, src, i + 1))
        src = 1 + i
    p.res_scale, p.res_level, p.res_dst = [40], [2], [src]
    assert p.validate() == -1

    def run_symbolic(prog):
        regs = {}
        for i in range(prog.arg_length):
            regs[i] = ("arg", i)
        for op in prog.ops:
            if op.opcode == OP_ALLOC:
                continue
            assert op.opcode == OP_ROTATE
            regs[op.dst] = ("rot", regs[op.lhs], op.rhs)
        return [regs[r] for r in prog.res_dst]

    want = run_symbolic(p)
    q = p.reuse_compact()
    assert q.validate() == -1
    # serial rotate chain: each value dies at the next op -> 1 arg + 2 regs
    assert q.num_ctxt <= 3 < p.num_ctxt
    assert run_symbolic(q) == want


def test_reuse_compact_keeps_live_values_apart():
    """Values with overlapping live ranges must not share a register."""
    p = HEVMProgram()
    p.arg_scale, p.arg_level = [40, 40], [2, 2]
    p.init_level = 6
    p.num_ctxt, p.num_ptxt = 6, 0
    p.ops = [
        HEVMOp(OP_ALLOC), HEVMOp(OP_ROTATE, 2, 0, 1),
        HEVMOp(OP_ALLOC), HEVMOp(OP_ROTATE, 3, 1, 2),
        HEVMOp(OP_ALLOC), HEVMOp(OP_MULCC, 4, 2, 3),
        HEVMOp(OP_ALLOC), HEVMOp(OP_ADDCC, 5, 4, 2),   # r2 still live here
    ]
    p.res_scale, p.res_level, p.res_dst = [40], [2], [5]
    q = p.reuse_compact()
    assert q.validate() == -1

    def run_symbolic(prog):
        regs = {i: ("arg", i) for i in range(prog.arg_length)}
        for op in prog.ops:
            if op.opcode == OP_ALLOC:
                continue
            if op.opcode == OP_ROTATE:
                regs[op.dst] = ("rot", regs[op.lhs], op.rhs)
            elif op.opcode == OP_MULCC:
                regs[op.dst] = ("mul", regs[op.lhs], regs[op.rhs])
            else:
                regs[op.dst] = ("add", regs[op.lhs], regs[op.rhs])
        return [regs[r] for r in prog.res_dst]

    assert run_symbolic(q) == run_symbolic(p)


def test_compiled_program_native_reuse_still_executes():
    """Compile a real traced function, compact its bytecode natively, and
    run both variants through the executor — identical decrypted output."""
    import dacapo_tpu as hc
    from dacapo_tpu.crypto.params import COMPILER_PROFILES
    from dacapo_tpu.crypto.scheme import Scheme
    from dacapo_tpu.ir import trace as trace_mod
    from dacapo_tpu.ir.config import load_profile
    from dacapo_tpu.passes.rewrite import cse, canonicalize, elide_constants
    from dacapo_tpu.passes.pipeline import compile_function
    from dacapo_tpu.vm.executor import HEVMExecutor

    profile = "test_n10"
    load_profile(COMPILER_PROFILES[profile])
    s = Scheme(profile)
    s.generate_keys(rot_steps=(1, 2))
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.3, n)

    def model(x):
        t = x.rotate(1) * hc.Plain(w)
        u = x.rotate(2) + t
        return u * u

    trace_mod._module.reset()
    fn = hc.func("c")(model).eval()
    cse(fn); canonicalize(fn)
    payloads = elide_constants(fn)
    prog = compile_function(fn, "pars", 25)
    assert prog.validate() == -1
    compact = prog.reuse_compact()
    assert compact.validate() == -1
    assert compact.num_ctxt <= prog.num_ctxt

    x = rng.uniform(-0.5, 0.5, n)
    golden = (np.roll(x, -2) + np.roll(x, -1) * w) ** 2
    outs = []
    for pr in (prog, compact):
        ex = HEVMExecutor(s, pr, payloads)
        ex.preprocess()
        outs.append(np.asarray(ex.run([x], jit=False), np.float64).ravel())
    # both variants correct (fresh encryption noise differs per run)
    for o in outs:
        assert np.sqrt(np.mean((o - golden) ** 2)) < 5e-3
