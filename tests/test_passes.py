"""Compiler-pass unit tests: SMU, hoisting, estimators, ELASM, SNR."""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.passes.rewrite import cse, canonicalize, elide_constants, privatize_constants
from dacapo_tpu.passes.smu import ScaleManagementUnit
from dacapo_tpu.passes.scale import proactive_rescaling, snr_rescaling
from dacapo_tpu.passes.hoist import early_modswitch, upscale_bubbling
from dacapo_tpu.passes.estimator import latency_estimator, error_estimator, naf_count
from dacapo_tpu.passes.elasm import elasm_explorer


@pytest.fixture(autouse=True)
def _cfg():
    load_profile("profiled_TPU_test_n10")


def _trace(body, n_args=1, clean=True):
    trace_mod._module.reset()
    f = hc.func(",".join(["c"] * n_args))(body)
    fn = f.eval()
    if clean:
        cse(fn)
        canonicalize(fn)
        payloads = elide_constants(fn)
        privatize_constants(fn)
        canonicalize(fn)
        return fn, payloads
    return fn, None


def test_smu_groups_and_noisy():
    def body(x):
        a = x * x          # consume: own unit
        b = a.rotate(3)    # noisy
        return b + a

    fn, _ = _trace(body)
    smu = ScaleManagementUnit(fn)
    assert smu.id_num >= 2
    rot_res = [op.result for op in fn.ops if op.opcode == "rotate"][0]
    assert smu.in_noisy_group(rot_res)
    # verify on unmanaged IR: all types equal -> consistent
    assert smu.verify()


def test_smu_add_chain_merges():
    """Associative add chains should share one unit (sub-key expansion)."""
    def body(x):
        a = x.rotate(1)
        b = x.rotate(2)
        c = x.rotate(3)
        return a + b + c

    fn, _ = _trace(body)
    smu = ScaleManagementUnit(fn)
    adds = [op for op in fn.ops if op.opcode == "add"]
    ids = {smu.get_id(op.result) for op in adds}
    assert len(ids) == 1, "chained adds must share an SMU"


def test_pars_then_smu_checker():
    """SMUChecker semantics: after management, each unit shares (scale,level)."""
    def body(x):
        a = x * x
        b = a.rotate(1)
        return b * a

    fn, _ = _trace(body)
    smu = ScaleManagementUnit(fn)
    smu.attach()
    proactive_rescaling(fn, 25)
    fn.verify()
    assert smu.verify(), "SMU (scale,level) consistency violated"


def test_early_modswitch_hoists():
    def body(x):
        return (x * x) * x

    fn, _ = _trace(body)
    proactive_rescaling(fn, 25)
    before = [op.opcode for op in fn.ops]
    early_modswitch(fn)
    canonicalize(fn)
    fn.verify()
    # modswitches must not sit directly before return if hoistable
    assert fn.attrs["init_level"] == 7


def test_upscale_bubbling_types_stay_valid():
    def body(x):
        a = x * x
        return a + a.rotate(1)

    fn, _ = _trace(body)
    snr_rescaling(fn, 20)
    upscale_bubbling(fn)
    canonicalize(fn)
    fn.verify()


def test_estimators():
    def body(x):
        y = x * x
        return y.rotate(5) + y

    fn, _ = _trace(body)
    proactive_rescaling(fn, 25)
    lat = latency_estimator(fn)
    err = error_estimator(fn)
    assert lat > 0
    assert err > 0
    assert naf_count(5, 512) == 2    # 5 = 4 + 1
    assert naf_count(7, 512) == 2    # 7 = 8 - 1


def test_elasm_small():
    def body(x):
        y = x * x
        z = y.rotate(1) + y
        return z * x

    fn, _ = _trace(body)
    elasm_explorer(fn, 20, parallel=2, num_iter=3, seed=0)
    from dacapo_tpu.passes.hoist import early_modswitch as em
    em(fn)
    cse(fn)
    canonicalize(fn)
    fn.verify()
    assert "est_latency" not in fn.attrs or fn.attrs["est_latency"] >= 0


def test_flexible_bootstrap():
    """FlexibleBootstrap absorbs modswitch users into the bootstrap target
    (reference FlexibleBootstrap.cpp:35-77)."""
    from dacapo_tpu.ir.earth import Function, Value, ScaleType, Op
    from dacapo_tpu.passes.hoist import flexible_bootstrap

    arg = Value(ScaleType(True, 25, 6), arg_index=0)
    bs = Op("bootstrap", [arg], {"targetLevel": 1},
            ScaleType(True, 25, 1))
    ms1 = Op("modswitch", [bs.result], {"downFactor": 3},
             ScaleType(True, 25, 4))
    ms2 = Op("modswitch", [bs.result], {"downFactor": 2},
             ScaleType(True, 25, 3))
    add = Op("add", [ms1.result, ms2.result], {}, None)
    fn = Function("f", [arg], [bs, ms1, ms2, add], [add.result])

    flexible_bootstrap(fn)
    assert bs.attrs["targetLevel"] == 3          # 1 + min(3, 2)
    assert bs.ty.level == 3
    assert ms1.attrs["downFactor"] == 1
    assert ms2.attrs["downFactor"] == 0          # folds away in canonicalize


def test_flexible_bootstrap_skips_mixed_users():
    from dacapo_tpu.ir.earth import Function, Value, ScaleType, Op
    from dacapo_tpu.passes.hoist import flexible_bootstrap

    arg = Value(ScaleType(True, 25, 6), arg_index=0)
    bs = Op("bootstrap", [arg], {"targetLevel": 1}, ScaleType(True, 25, 1))
    ms = Op("modswitch", [bs.result], {"downFactor": 3}, ScaleType(True, 25, 4))
    neg = Op("negate", [bs.result], {}, ScaleType(True, 25, 1))
    fn = Function("f", [arg], [bs, ms, neg], [ms.result, neg.result])

    flexible_bootstrap(fn)
    assert bs.attrs["targetLevel"] == 1          # untouched: non-modswitch user


def test_check_smu_pipeline_flag():
    """--enable-check-smu equivalent asserts SMU consistency post-walk."""
    from dacapo_tpu.passes.pipeline import run_scale_pipeline

    def body(x):
        y = x * x
        return y.rotate(2) + y

    fn, _ = _trace(body)
    run_scale_pipeline(fn, "pars", 25, check_smu=True)
    fn.verify()


def test_smu_strict_verify_rejects_forged_partition():
    """The weak (scale, level) check accepts a forged over-split partition;
    the full definition-uniqueness verify (ScaleManagementUnit.cpp:372-507)
    must reject it: two groups with identical (fwd, bwd, consume) defs."""
    from dacapo_tpu.passes.scale import set_value_attr

    def body(x):
        a = x + x
        b = x + x      # same defs as a -> same SMU in a correct partition
        return a * b

    fn, _ = _trace(body, clean=False)
    smu = ScaleManagementUnit(fn)
    assert smu.verify() and smu.verify_definitions()

    # forge: split {a, b} (one true group) into two ids
    values = list(fn.args) + [op.result for op in fn.ops]
    adds = [op.result for op in fn.ops if op.opcode == "add"]
    assert smu.get_id(adds[0]) == smu.get_id(adds[1])
    forged = {}
    nxt = smu.id_num
    for v in values:
        forged[v] = smu.get_id(v)
    forged[adds[1]] = nxt
    for v, i in forged.items():
        set_value_attr(fn, v, "smu", i)
    fn.attrs["smu_attached"] = True
    forged_smu = ScaleManagementUnit(fn)
    assert forged_smu.verify()                   # weak check can't see it
    assert not forged_smu.verify_definitions()   # strict check rejects
