"""Cross-artifact conformance: load and execute a reference-format
`.hevm` + `.cst` pair that was NOT produced by this repo's writers.

The fixture bytes are hand-assembled field by field from the reference
binary spec (include/hecate/Support/HEVMHeader.h:10-35; EmitHEVM.cpp:109-119
write side, SEAL_HEVM.cpp:182-234 read side):

    HEVMHeader { u32 magic=0x4845564D; u32 hevm_header_size;
                 u64 arg_length; u64 res_length; }
    ConfigBody { u64 config_body_length; u64 num_operations;
                 u64 num_ctxt_buffer; u64 num_ptxt_buffer; u64 init_level; }
    u64 arg_scale[], arg_level[], res_scale[], res_level[], res_dst[]
    HEVMOperation { u16 opcode, dst, lhs, rhs } * num_operations

    .cst: i64 count, then per constant { i64 len; f64 data[len] }

This guards the byte layout against by-construction-only compatibility: any
writer/reader drift from the reference spec fails here, not in the field.
"""

import struct

import numpy as np
import pytest

from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir.serialize import read_cst
from dacapo_tpu.vm.executor import HEVMExecutor
from dacapo_tpu.vm.hevm import HEVMProgram

PROFILE = "test_n10"
SCALE = 25          # matches test_n10 scale_bits
LEVEL = 2           # encode/arg level (hevm levels)


def _fixture_hevm(tmp_path):
    """out = (x * c  >> rescale >> rotate 5) + itself  (one of each class).

    Registers: ct0 = arg x, ct1 = mul, ct2 = rescale, ct3 = rotate,
    ct4 = result; pt0 = encode(cst 0). Includes a 0xFFFF alloc marker
    (tensor.empty), which interpreters must skip."""
    ops = [
        (0xFFFF, 1, 0, 0),                     # alloc marker for ct1
        (0, 0, 0, (LEVEL << 10) | SCALE),      # encode pt0 <- cst0
        (9, 1, 0, 0),                          # mulcp  ct1 = ct0 * pt0
        (3, 2, 1, 0),                          # rescalec ct2 = rs(ct1)
        (1, 3, 2, 5),                          # rotatec ct3 = rot(ct2, 5)
        (6, 4, 3, 3),                          # addcc  ct4 = ct3 + ct3
    ]
    arg_scale, arg_level = [SCALE], [LEVEL]
    res_scale, res_level, res_dst = [2 * SCALE - 30], [LEVEL - 1], [4]

    body_ints = arg_scale + arg_level + res_scale + res_level + res_dst
    config_body_length = 40 + 8 * len(body_ints)
    blob = b""
    blob += struct.pack("<I", 0x4845564D)          # magic "HEVM"
    blob += struct.pack("<I", 24)                  # hevm_header_size
    blob += struct.pack("<Q", 1)                   # arg_length
    blob += struct.pack("<Q", 1)                   # res_length
    blob += struct.pack("<Q", config_body_length)
    blob += struct.pack("<Q", len(ops))            # num_operations
    blob += struct.pack("<Q", 5)                   # num_ctxt_buffer
    blob += struct.pack("<Q", 1)                   # num_ptxt_buffer
    blob += struct.pack("<Q", LEVEL)               # init_level
    for v in body_ints:
        blob += struct.pack("<Q", v)
    for opcode, dst, lhs, rhs in ops:
        blob += struct.pack("<HHHH", opcode, dst, lhs, rhs)

    p = tmp_path / "fixture.hevm"
    p.write_bytes(blob)
    return str(p)


def _fixture_cst(tmp_path, c_vec):
    blob = struct.pack("<q", 1)
    a = np.asarray(c_vec, dtype="<f8")
    blob += struct.pack("<q", a.size)
    blob += a.tobytes()
    p = tmp_path / "fixture.cst"
    p.write_bytes(blob)
    return str(p)


@pytest.fixture(scope="module")
def scheme():
    s = Scheme(PROFILE)
    s.generate_keys(rot_steps=(5,))
    return s


def test_load_validate_execute_foreign_artifacts(tmp_path, scheme):
    n = scheme.ctx.config.n_slots
    rng = np.random.default_rng(11)
    c_vec = rng.uniform(-1, 1, n)
    hevm_path = _fixture_hevm(tmp_path)
    cst_path = _fixture_cst(tmp_path, c_vec)

    prog = HEVMProgram.load(hevm_path)
    prog.validate()
    assert prog.arg_length == 1 and prog.res_length == 1
    assert prog.num_ctxt == 5 and prog.num_ptxt == 1
    assert [op.opcode for op in prog.ops] == [0xFFFF, 0, 9, 3, 1, 6]

    consts = read_cst(cst_path)
    assert len(consts) == 1 and consts[0].size == n

    ex = HEVMExecutor(scheme, prog, consts)
    ex.preprocess()
    x = rng.uniform(-1, 1, n)
    out = ex.run([x])[0]

    want = 2.0 * np.roll(x * c_vec, -5)
    rms = float(np.sqrt(np.mean((np.asarray(out) - want) ** 2)))
    assert rms < 5e-3, rms


def test_writer_reproduces_foreign_bytes(tmp_path, scheme):
    """Round-trip: our writer emits byte-identical artifacts for the same
    program — the write side of the conformance contract."""
    hevm_path = _fixture_hevm(tmp_path)
    prog = HEVMProgram.load(hevm_path)
    out_path = str(tmp_path / "rewritten.hevm")
    prog.save(out_path)
    assert open(out_path, "rb").read() == open(hevm_path, "rb").read()
