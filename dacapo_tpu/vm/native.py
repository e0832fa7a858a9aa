"""ctypes binding to the native runtime core (native/hevm_core.cpp).

The C++ library owns the artifact layer — .hevm/.cst binary IO, bytecode
validation, and register-reuse compaction — mirroring where the reference
keeps its native runtime (SEAL_HEVM.cpp loaders, ReuseBuffer.cpp). The .so
is built on demand with `make` (g++); every entry point has a pure-Python
fallback in vm/hevm.py and ir/serialize.py, so the package works without a
toolchain and the two implementations cross-check each other in tests.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhevm_core.so")
_lib = None
_tried = False


def _build():
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native core; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("DACAPO_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.hevm_load.restype = ctypes.c_void_p
    lib.hevm_load.argtypes = [ctypes.c_char_p]
    lib.hevm_save.restype = ctypes.c_int
    lib.hevm_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.hevm_create.restype = ctypes.c_void_p
    lib.hevm_create.argtypes = [ctypes.c_uint64, ctypes.c_uint64,
                                u64p, u64p, u64p, u64p, u64p,
                                ctypes.c_uint64, ctypes.c_uint64,
                                ctypes.c_uint64, ctypes.c_uint64, u16p]
    lib.hevm_meta.argtypes = [ctypes.c_void_p, u64p]
    lib.hevm_copy_arrays.argtypes = [ctypes.c_void_p] + [u64p] * 5
    lib.hevm_copy_ops.argtypes = [ctypes.c_void_p, u16p]
    lib.hevm_validate.restype = ctypes.c_int64
    lib.hevm_validate.argtypes = [ctypes.c_void_p]
    lib.hevm_reuse_buffers.restype = ctypes.c_int64
    lib.hevm_reuse_buffers.argtypes = [ctypes.c_void_p]
    lib.hevm_free.argtypes = [ctypes.c_void_p]
    lib.cst_load.restype = ctypes.c_void_p
    lib.cst_load.argtypes = [ctypes.c_char_p]
    lib.cst_count.restype = ctypes.c_uint64
    lib.cst_count.argtypes = [ctypes.c_void_p]
    lib.cst_len.restype = ctypes.c_uint64
    lib.cst_len.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.cst_copy.argtypes = [ctypes.c_void_p, ctypes.c_uint64, f64p]
    lib.cst_save.restype = ctypes.c_int
    lib.cst_save.argtypes = [ctypes.c_char_p, ctypes.c_uint64, u64p, f64p]
    lib.cst_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def _u64arr(vals):
    return np.ascontiguousarray(np.asarray(vals, dtype=np.uint64))


def _u64ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _handle_from_program(lib, prog):
    ops = np.zeros((max(len(prog.ops), 1), 4), dtype=np.uint16)
    for i, op in enumerate(prog.ops):
        ops[i] = (op.opcode & 0xFFFF, op.dst & 0xFFFF,
                  op.lhs & 0xFFFF, op.rhs & 0xFFFF)
    arrs = [_u64arr(prog.arg_scale), _u64arr(prog.arg_level),
            _u64arr(prog.res_scale), _u64arr(prog.res_level),
            _u64arr(prog.res_dst)]
    h = lib.hevm_create(
        len(prog.arg_scale), len(prog.res_scale),
        *[_u64ptr(a) for a in arrs],
        prog.init_level, prog.num_ctxt, prog.num_ptxt, len(prog.ops),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return h


def _program_from_handle(lib, h, cls, op_cls):
    meta = np.zeros(6, dtype=np.uint64)
    lib.hevm_meta(h, _u64ptr(meta))
    argn, resn, nops, nct, npt, init_level = (int(x) for x in meta)
    arrs = [np.zeros(max(argn, 1), dtype=np.uint64) for _ in range(2)] + \
           [np.zeros(max(resn, 1), dtype=np.uint64) for _ in range(3)]
    lib.hevm_copy_arrays(h, *[_u64ptr(a) for a in arrs])
    ops = np.zeros((max(nops, 1), 4), dtype=np.uint16)
    lib.hevm_copy_ops(h, ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    p = cls()
    p.arg_scale = arrs[0][:argn].tolist()
    p.arg_level = arrs[1][:argn].tolist()
    p.res_scale = arrs[2][:resn].tolist()
    p.res_level = arrs[3][:resn].tolist()
    p.res_dst = arrs[4][:resn].tolist()
    p.init_level, p.num_ctxt, p.num_ptxt = init_level, nct, npt
    p.ops = [op_cls(int(o[0]), int(o[1]), int(o[2]), int(o[3]))
             for o in ops[:nops]]
    return p


def save_program(prog, path):
    """Native .hevm writer; returns False if the core is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    h = _handle_from_program(lib, prog)
    rc = lib.hevm_save(h, os.fsencode(path))
    lib.hevm_free(h)
    return rc == 0


def load_program(path, cls, op_cls):
    """Native .hevm reader; returns None if the core is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.hevm_load(os.fsencode(path))
    if not h:
        raise IOError(f"native hevm_load failed for {path}")
    p = _program_from_handle(lib, h, cls, op_cls)
    lib.hevm_free(h)
    return p


def validate_program(prog):
    """-1 if OK, else index of the first invalid op (-2: bad result).
    None if the native core is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = _handle_from_program(lib, prog)
    rc = int(lib.hevm_validate(h))
    lib.hevm_free(h)
    return rc


def reuse_buffers_program(prog, cls, op_cls):
    """Native register-reuse compaction; returns a new program, or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = _handle_from_program(lib, prog)
    rc = int(lib.hevm_reuse_buffers(h))
    if rc < 0:
        lib.hevm_free(h)
        raise ValueError("program failed validation before reuse")
    p = _program_from_handle(lib, h, cls, op_cls)
    lib.hevm_free(h)
    return p


def read_cst_native(path):
    """Native .cst reader; None if the core is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.cst_load(os.fsencode(path))
    if not h:
        raise IOError(f"native cst_load failed for {path}")
    out = []
    for i in range(int(lib.cst_count(h))):
        n = int(lib.cst_len(h, i))
        buf = np.zeros(max(n, 1), dtype=np.float64)
        lib.cst_copy(h, i, buf.ctypes.data_as(
            ctypes.POINTER(ctypes.c_double)))
        out.append(buf[:n])
    lib.cst_free(h)
    return out


def write_cst_native(payloads, path):
    """Native .cst writer; returns False if the core is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    arrs = [np.ascontiguousarray(np.asarray(a, dtype=np.float64).ravel())
            for a in payloads]
    lens = _u64arr([a.size for a in arrs])
    flat = (np.concatenate(arrs) if arrs
            else np.zeros(1, dtype=np.float64))
    rc = lib.cst_save(os.fsencode(path), len(arrs), _u64ptr(lens),
                      flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return rc == 0
