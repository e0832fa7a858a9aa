"""ELASM: error-latency-aware scale management (simulated annealing).

Ports ScaleManagementScheduler.cpp:30-95 (random plan mutation over SMU
edges + apply_schedule materialization) and ELASMExplorer.cpp:40-179
(`parallel` clones x `num_iter` iterations; inner pipeline
scheduler -> SNR -> upscale bubbling -> canonicalize -> early modswitch ->
canonicalize/CSE -> error+latency estimators; cost = sqrt(latency) *
(beta + log2 error); per-explorer Metropolis accept with gamma).
"""

import math

import numpy as np

from ..ir.config import current_config
from ..ir.earth import Function, Op, infer_type
from .smu import ScaleManagementUnit
from .scale import snr_rescaling
from .hoist import early_modswitch, upscale_bubbling
from .rewrite import canonicalize, cse
from .estimator import latency_estimator, error_estimator


def scale_management_scheduler(fn: Function, smu=None, rng=None, config=None):
    cfg = config or current_config()
    if smu is None:
        smu = ScaleManagementUnit(fn)
    if "sm_plan_edge" not in fn.attrs:
        fn.attrs["sm_plan_edge"] = []
        fn.attrs["sm_plan_scale"] = []
        fn.attrs["sm_plan_level"] = []
    elif not fn.attrs.get("no_mutation"):
        rng = rng or np.random.default_rng()
        n_edges = max(1, smu.edge_num)
        plan_num = int(rng.poisson(int(math.sqrt(n_edges))))
        plan = {}
        for _ in range(plan_num):
            e = int(rng.integers(0, n_edges))
            plan[e] = (max(0, int(rng.integers(-15, 16))),
                       int(rng.integers(0, 3)))
        fn.attrs["sm_plan_edge"] = list(plan.keys())
        fn.attrs["sm_plan_scale"] = [v[0] for v in plan.values()]
        fn.attrs["sm_plan_level"] = [v[1] for v in plan.values()]

    # materialize apply_schedule on every cipher operand of the chosen edges
    pending = {}
    for e, sc, lv in zip(fn.attrs["sm_plan_edge"], fn.attrs["sm_plan_scale"],
                         fn.attrs["sm_plan_level"]):
        if e >= smu.edge_num:
            continue
        for (op, k) in smu.edge_to_oper[e]:
            v = op.operands[k]
            if not v.ty.is_cipher:
                continue
            ap = Op("apply_schedule", [v],
                    {"scaleFactor": sc, "levelFactor": lv}, v.ty, op.loc)
            op.operands[k] = ap.result
            pending.setdefault(id(op), []).append(ap)
    if pending:
        new_ops = []
        for op in fn.ops:
            new_ops.extend(pending.get(id(op), []))
            new_ops.append(op)
        fn.ops = new_ops
    return fn


def _inner_pipeline(fn, waterline, output_val, cfg, rng):
    smu = ScaleManagementUnit(fn)   # from attached attrs on clones
    scale_management_scheduler(fn, smu, rng, cfg)
    snr_rescaling(fn, waterline, output_val, smu=smu, config=cfg)
    upscale_bubbling(fn)
    canonicalize(fn)
    early_modswitch(fn)
    canonicalize(fn)
    cse(fn)
    err = error_estimator(fn, cfg)
    lat = latency_estimator(fn, cfg)
    return lat, err


def elasm_explorer(fn: Function, waterline: int, output_val: int = 0,
                   config=None, parallel=20, num_iter=1000, beta=50.0,
                   gamma=50.0, seed=None):
    cfg = config or current_config()
    rng = np.random.default_rng(seed)
    smu = ScaleManagementUnit(fn)
    smu.attach()

    def cost_func(lat, err):
        return math.sqrt(max(lat, 1e-12)) * (beta + math.log2(max(err, 1e-300)))

    plans = [([], [], [])] * parallel
    costs = [float("inf")] * parallel
    opt_cost = float("inf")
    opt_plan = ([], [], [])

    for _ in range(num_iter):
        for i in range(parallel):
            dup, _ = fn.clone()
            dup.attrs["sm_plan_edge"] = list(plans[i][0])
            dup.attrs["sm_plan_scale"] = list(plans[i][1])
            dup.attrs["sm_plan_level"] = list(plans[i][2])
            try:
                lat, err = _inner_pipeline(dup, waterline, output_val, cfg, rng)
            except Exception:
                continue
            cost = cost_func(lat, err)
            plan = (dup.attrs["sm_plan_edge"], dup.attrs["sm_plan_scale"],
                    dup.attrs["sm_plan_level"])
            alpha = min(1.0, 2.0 ** (-gamma * (1.0 - costs[i] / cost)))
            if rng.uniform() < alpha:
                plans[i] = plan
                costs[i] = cost
            if cost < opt_cost:
                opt_plan = plan
                opt_cost = cost

    # apply the winning plan to the real function
    fn.attrs["sm_plan_edge"] = list(opt_plan[0])
    fn.attrs["sm_plan_scale"] = list(opt_plan[1])
    fn.attrs["sm_plan_level"] = list(opt_plan[2])
    fn.attrs["no_mutation"] = True
    scale_management_scheduler(fn, smu, rng, cfg)
    snr_rescaling(fn, waterline, output_val, smu=smu, config=cfg)
    upscale_bubbling(fn)
    canonicalize(fn)
    return fn
