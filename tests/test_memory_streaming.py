"""Device-memory management: GaloisStore LRU + plaintext streaming.

Big programs (ResNet at N=2^15: 202 rotation keys ~7.4 GB, 4.9k pre-encoded
plaintexts ~7.5 GB) exceed one chip's HBM, so the runtime keeps host-backed
stores with budgeted device LRU caches (vm/executor.py, crypto/keys.py).
These tests force tiny budgets on a small profile and check results stay
bit-identical to the unbudgeted path.
"""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.keys import GaloisStore
from dacapo_tpu.crypto.params import COMPILER_PROFILES
from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.passes.rewrite import (
    cse, canonicalize, elide_constants, privatize_constants,
)
from dacapo_tpu.passes.pipeline import compile_function
from dacapo_tpu.vm.executor import HEVMExecutor

PROFILE = "test_n10"


def test_galois_store_dict_compat():
    st = GaloisStore()
    a = np.arange(12, dtype=np.uint32).reshape(3, 4)
    st[5] = a
    assert 5 in st and 7 not in st
    assert np.array_equal(np.asarray(st[5]), a)
    assert sorted(st.keys()) == [5]
    items = dict(st.items())
    assert np.array_equal(np.asarray(items[5]), a)


def test_galois_store_budget_eviction():
    a = np.arange(64, dtype=np.uint32)
    st = GaloisStore()
    for i in range(8):
        st[i] = a + i
    st.set_budget(3 * a.nbytes)          # room for 3 device entries
    assert st._dev_bytes <= 3 * a.nbytes
    for i in range(8):                   # stream everything through the LRU
        assert np.array_equal(np.asarray(st[i]), a + i)
        assert st._dev_bytes <= 3 * a.nbytes
    assert len(st) == 8                  # host copies all authoritative
    # re-set under budget keeps correctness
    st[3] = a * 2
    assert np.array_equal(np.asarray(st[3]), a * 2)


def _compile_rotation_program():
    load_profile(COMPILER_PROFILES[PROFILE])
    rng = np.random.default_rng(7)
    s = Scheme(PROFILE)
    s.generate_keys()
    n = s.ctx.config.n_slots
    masks = rng.normal(0, 0.5, (6, n))

    def body(x):
        acc = None
        for i in range(6):
            t = x.rotate(i + 1) * hc.Plain(masks[i])
            acc = t if acc is None else acc + t
        return acc * acc

    trace_mod._module.reset()
    fn = hc.func("c")(body).eval()
    fn.name = "StreamProbe"
    cse(fn); canonicalize(fn)
    payloads = elide_constants(fn)
    privatize_constants(fn); canonicalize(fn)
    prog = compile_function(fn, "pars", 25)
    x = rng.uniform(-1, 1, n)
    want = None
    for i in range(6):
        t = np.roll(x, -(i + 1)) * masks[i]
        want = t if want is None else want + t
    return s, prog, payloads, x, want * want


def test_streaming_executor_matches_resident():
    s, prog, payloads, x, want = _compile_rotation_program()

    ex = HEVMExecutor(s, prog, payloads)
    ex.preprocess()
    ref = ex.run([x], jit=False)[0]

    ex2 = HEVMExecutor(s, prog, payloads)
    # force streaming with a tiny plaintext budget and a 2-key galois budget
    ex2._pt_budget = 2 * s.ctx.n * 4
    s.set_key_budget(2 * s.galois_key_bytes())
    ex2.preprocess()
    assert ex2._streaming
    out = ex2.run([x], jit=False)[0]

    # encryption is randomized, so compare both paths against the golden
    # (identical pipelines; only residency/transfer of u32 planes differs)
    for res in (ref, out):
        r = float(np.sqrt(np.mean((res[: len(want)] - want) ** 2)))
        assert r < 5e-3, f"rms {r}"
    s.set_key_budget(None)


def test_preprocess_dedups_payloads():
    s, prog, payloads, x, want = _compile_rotation_program()
    ex = HEVMExecutor(s, prog, payloads)
    ex.preprocess()
    cids = {c for c in ex._pt_cid if c is not None}
    n_encodes = sum(1 for p in ex.plains if p is not None)
    assert len(cids) <= n_encodes
    s.set_key_budget(None)


def test_segprof_smoke():
    """Segmented runner with profiling on: attribution records, RSS capture,
    and the structural dedup path all execute (guards segprof-only crashes
    that otherwise only surface on the chip)."""
    import numpy as np
    import dacapo_tpu as hc
    from dacapo_tpu.crypto.params import COMPILER_PROFILES
    from dacapo_tpu.crypto.scheme import Scheme
    from dacapo_tpu.ir import trace as trace_mod
    from dacapo_tpu.ir.config import load_profile
    from dacapo_tpu.passes.rewrite import (
        cse, canonicalize, elide_constants, privatize_constants,
    )
    from dacapo_tpu.passes.pipeline import compile_function
    from dacapo_tpu.vm.executor import HEVMExecutor

    profile = "test_n10"
    load_profile(COMPILER_PROFILES[profile])
    s = Scheme(profile)
    s.generate_keys()
    n = s.ctx.config.n_slots
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.3, (4, n))

    def model(x):
        acc = None
        for i in range(4):
            t = x.rotate(i) * hc.Plain(w[i])
            acc = t if acc is None else acc + t
        h = acc + 0.1
        h = hc.bootstrap(h * h)
        return h * hc.Plain(w[0])

    trace_mod._module.reset()
    fn_ir = hc.func("c")(model).eval()
    cse(fn_ir); canonicalize(fn_ir)
    payloads = elide_constants(fn_ir)
    privatize_constants(fn_ir)
    canonicalize(fn_ir)
    prog = compile_function(fn_ir, "pars", 25)
    ex = HEVMExecutor(s, prog, payloads)
    ex.preprocess()
    ex.set_profiling(True)
    x = rng.uniform(-1, 1, n)
    out = ex.run([x])[0]
    golden = (sum(np.roll(x, -i) * w[i] for i in range(4)) + 0.1) ** 2 * w[0]
    rms = float(np.sqrt(np.mean((np.asarray(out) - golden) ** 2)))
    assert rms < 5e-2, rms
    assert ex.seg_profile, "profiling records missing"
    assert all(p["rss"] > 0 for p in ex.seg_profile)
