"""ELASM evidence run: --elasm vs --pars on the real MLP trace (CPU-only).

Reference regime: ELASMExplorer.cpp:93-111 runs parallel=20 explorers x
num_iter=1000. Here iterations are CLI-configurable (default 200) since the
explorer chains are process-parallel python. Prints est_latency (us) and
est_error for both pipelines; results recorded in docs/ELASM_RESULTS.md.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import copy
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")

from dacapo_tpu.ir.serialize import load_function
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.passes.pipeline import run_scale_pipeline
from dacapo_tpu.passes.estimator import latency_estimator, error_estimator
from dacapo_tpu.passes.hoist import early_modswitch
from dacapo_tpu.passes.rewrite import cse, canonicalize


def measure(pipeline, waterline, iters, parallel, seed):
    from examples.benchmarks.MLP import trace
    path = trace()
    fn = load_function(path)
    cfg = load_profile("profiled_TPU_n14")
    t0 = time.time()
    opts = {}
    if pipeline == "elasm":
        opts = dict(num_iter=iters, parallel=parallel, seed=seed)
    run_scale_pipeline(fn, pipeline, waterline, config=cfg, **opts)
    fn.verify(cfg)
    lat = latency_estimator(fn, cfg)
    err = error_estimator(fn, cfg)
    return lat, err, time.time() - t0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--parallel", type=int, default=20)
    ap.add_argument("--waterline", type=int, default=40)
    ap.add_argument("--seed", type=int, default=7)
    a = ap.parse_args()
    lat_p, err_p, t_p = measure("pars", a.waterline, 0, 0, 0)
    print(f"pars : est_latency={lat_p:.1f}us est_error={err_p:.4g} ({t_p:.1f}s)")
    lat_e, err_e, t_e = measure("elasm", a.waterline, a.iters, a.parallel, a.seed)
    print(f"elasm: est_latency={lat_e:.1f}us est_error={err_e:.4g} ({t_e:.1f}s)"
          f"  [{a.parallel}x{a.iters} iters]")
    import math
    cost = lambda l, e: math.sqrt(max(l, 1e-12)) * (50 + math.log2(max(e, 1e-300)))
    print(f"cost: pars={cost(lat_p, err_p):.2f} elasm={cost(lat_e, err_e):.2f}")
