"""Shared trace/test harness for the example benchmarks.

Mirrors the reference flow (SURVEY.md §3.1/§3.3): `trace_and_save` is the
`hc-trace` step (trace -> cleanup pipeline -> traced/<Name>.eir.json +
_hecate_<Name>.cst); `run_test` is the `hc-test` step (load artifacts,
encrypt inputs, run the VM, decrypt, report latency + RMS via the runner's
printer block).
"""

import os
import time

import numpy as np

import dacapo_tpu as hc
from dacapo_tpu.ir import trace as trace_mod


def trace_and_save(name, paramstr, body, dirs="traced", cst_dirs=None):
    cst_dirs = cst_dirs or dirs
    trace_mod._module.reset()
    body.__name__ = name
    hc.func(paramstr)(body)
    trace_mod.save(dirs, cst_dirs)
    return os.path.join(dirs, f"{name}.eir.json")


def compile_traced(name, pipeline, waterline, profile,
                   traced_dir="traced", out_dir="optimized"):
    """The `hopt`/`hbt` step: Earth IR -> scale-managed -> .hevm."""
    from dacapo_tpu.ir.serialize import load_function
    from dacapo_tpu.ir.config import load_profile
    from dacapo_tpu.crypto.params import COMPILER_PROFILES
    from dacapo_tpu.passes.pipeline import compile_function

    load_profile(COMPILER_PROFILES[profile])
    fn = load_function(os.path.join(traced_dir, f"{name}.eir.json"))
    prefix = os.path.join(out_dir, pipeline, f"{name}.{waterline}")
    t0 = time.perf_counter()
    compile_function(fn, pipeline, waterline, out_prefix=prefix)
    print(f"[hc] compile {name} ({pipeline},{waterline}): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    return f"{prefix}._hecate_{name}.hevm"


def run_test(name, pipeline, waterline, profile, inputs, golden,
             postprocess=None, traced_dir="traced", out_dir="optimized",
             jit="auto", warmup=None):
    """Load artifacts, execute encrypted, compare to `golden`, print report.

    warmup: extra untimed runs first. On TPU the first execution of each op
    signature includes its one-time XLA compile; warmup=1 (the accelerator
    default) reports the steady-state latency (every signature hits the jit
    cache), which is the deployment-serving number comparable to the
    reference's long-lived VM. CPU test boxes default to 0.
    """
    if warmup is None:
        import jax
        warmup = 1 if jax.devices()[0].platform in ("tpu", "axon") else 0
    hevm = hc.HEVM(profile=profile, jit=jit)
    cst = os.path.join(traced_dir, f"_hecate_{name}.cst")
    hv = os.path.join(out_dir, pipeline, f"{name}.{waterline}._hecate_{name}.hevm")
    if not os.path.exists(hv):
        compile_traced(name, pipeline, waterline, profile, traced_dir, out_dir)
    t0 = time.perf_counter()
    hevm.load(cst, hv)
    print(f"[hc] load+preencode: {time.perf_counter()-t0:.1f}s", flush=True)
    for i, dat in enumerate(inputs):
        hevm.setInput(i, dat)
    for w in range(warmup):
        t0 = time.perf_counter()
        hevm.run()
        print(f"[hc] warmup run {w}: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter_ns()
    hevm.run()
    latency = (time.perf_counter_ns() - t0) / 1e9
    res = hevm.getOutput()
    if postprocess is not None:
        res = postprocess(res)
    err = np.asarray(res, np.float64).ravel() - np.asarray(golden, np.float64).ravel()
    rms = float(np.sqrt(np.mean(err * err)))
    hevm.printer(latency, rms)
    return res, latency, rms
