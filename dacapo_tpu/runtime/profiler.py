"""Backend op profiler: measures per-op x per-level latency tables.

Reference analog: the profiled_{SEAL,HEAAN}_{CPU,GPU}.json files are measured
micro-op costs the planner optimizes against (SURVEY.md §5 tracing/profiling).
Here they are re-measured on the live JAX backend (TPU or CPU) and written in
the same schema our CompilerConfig loads (ir/config.py).

Latencies are microseconds. `_single` = one-operand form, `_double` =
two-ciphertext form (the reference's naming from HEProfInterface).
"""

import json
import os
import time

import numpy as np


def _time(fn, *args, iters=10, warmup=3):
    """Median of per-iteration wall times: on a tunneled single-chip setup
    the dispatch path has multi-hundred-us outliers (claim renewals, host
    GC) that poison a mean — the planner needs the typical cost."""
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e6      # us


def isotonic(v):
    """Nondecreasing least-squares fit (pool adjacent violators). Op cost is
    monotone in level (strictly more rows of work); residual variation in
    the measurements is tunnel-dispatch jitter, which would otherwise hand
    the DP planner a nonsense cost surface."""
    v = [float(x) for x in v]
    blocks = [[x, 1] for x in v]   # [mean, count]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] > out[-1][0]:
            s2, n2 = out.pop()
            s1, n1 = out.pop()
            out.append([(s1 * n1 + s2 * n2) / (n1 + n2), n1 + n2])
    res = []
    for mean, cnt in out:
        res.extend([round(mean, 2)] * cnt)
    return res


def profile_backend(profile="tpu_n15", out_path=None, iters=10,
                    bootstrap=False):
    from ..crypto.scheme import Scheme
    from ..crypto.params import PROFILES

    s = Scheme(profile)
    s.generate_keys(rot_steps=(1,))
    cfg = s.ctx.config
    n = cfg.n_slots
    rng = np.random.default_rng(0)
    a = s.encrypt(rng.uniform(-1, 1, n))
    b = s.encrypt(rng.uniform(-1, 1, n))
    pt = s.encode(rng.uniform(-1, 1, n))
    ev = s.ev
    rlk, gk = s.keys.rlk, s.keys.galois[1]

    lat = {k: [] for k in (
        "earth.rotate_single", "earth.negate_single", "earth.rescale_single",
        "earth.modswitch_single", "earth.upscale_single",
        "earth.add_single", "earth.add_double",
        "earth.mul_single", "earth.mul_double", "earth.bootstrap_single",
        "earth.constant_single",
    )}

    rr = cfg.rescale_rows

    def rescale_level(x, nl):
        return ev.rescale_k(x, nl, rr)

    # table entry j corresponds to compiler level j+1 (ir/config.py pads a
    # leading 0 for level 0), i.e. (j+2)*rr active RNS rows
    for lv in range(1, cfg.num_levels):
        nl = (lv + 1) * rr
        ad = a.data[:, :nl, :]
        bd = b.data[:, :nl, :]
        pd = pt.data[:nl, :]
        lat["earth.rotate_single"].append(_time(
            lambda x: ev.rotate(x, nl, 1, gk), ad, iters=iters))
        lat["earth.negate_single"].append(_time(
            lambda x: ev.neg_ct(x, nl), ad, iters=iters))
        lat["earth.rescale_single"].append(_time(
            lambda x: rescale_level(x, nl), ad, iters=iters))
        lat["earth.modswitch_single"].append(_time(
            lambda x: ev.mod_drop(x, rr), ad, iters=iters))
        lat["earth.upscale_single"].append(_time(
            lambda x: ev.upscale(x, nl, 5), ad, iters=iters))
        lat["earth.add_single"].append(_time(
            lambda x: ev.add_pt(x, pd, nl), ad, iters=iters))
        lat["earth.add_double"].append(_time(
            lambda x, y: ev.add_ct(x, y, nl), ad, bd, iters=iters))
        lat["earth.mul_single"].append(_time(
            lambda x: ev.mul_pt(x, pd, nl), ad, iters=iters))
        lat["earth.mul_double"].append(_time(
            lambda x, y: ev.mul_ct(x, y, nl, rlk), ad, bd, iters=iters))
        lat["earth.constant_single"].append(50.0)
        if bootstrap:
            bs = s.enable_native_bootstrap()
            lat["earth.bootstrap_single"].append(_time(
                lambda x: bs.bootstrap(x, nl, float(a.scale), nl - 1)[0],
                ad, iters=max(1, iters // 5)))
        else:
            # scale the reference HEaaN-GPU curve as the placeholder
            lat["earth.bootstrap_single"].append(250000.0 + 8000.0 * nl)

    lat = {k: isotonic(v) for k, v in lat.items()}

    from ..crypto.params import COMPILER_PROFILES
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "..", "profiles",
        COMPILER_PROFILES.get(profile, f"profiled_TPU_{profile}") + ".json")
    doc = {
        "runtime": "TPU-HEVM",
        "rescalingFactor": cfg.rf_bits,
        "polynomialDegree": cfg.n,
        "levelLowerBound": 2,
        "levelUpperBound": cfg.num_levels - 1,
        "bootstrapLevelLowerBound": 2,
        "bootstrapLevelUpperBound": cfg.num_levels - 1,
        "latencyTable": lat,
    }
    # keep the analytic noiseTable (ErrorEstimator input) if one exists —
    # re-profiling measures latency only
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                old = json.load(f)
            if "noiseTable" in old:
                doc["noiseTable"] = old["noiseTable"]
        except (OSError, json.JSONDecodeError):
            pass
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    return os.path.abspath(out_path)
