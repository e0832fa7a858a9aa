"""Benchmark: CKKS ct-ct multiply (with relinearization) throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's profiled SEAL-CPU ct-ct multiply at top level,
160732 us/op (profiled_SEAL_CPU.json latencyTable earth.mul_double, level 13,
N=2^15 Delta=2^60) -> 6.22 mult/s. We run the same-scale parity profile
(tpu_n15: N=2^15, L=14 RNS primes) on one TPU chip.

NOTE r5: rounds 1-4 reported dispatch rate, not compute rate —
jax.block_until_ready on the tunneled axon backend returns before the
device finishes (see time_op). BENCH_r01..r04 values (13k-45k mult/s) are
therefore NOT comparable with r5+; the honest chained+downloaded number is
~10-50x lower and matches the end-to-end run attribution.

Extra per-op timings (rotate, rescale, add) go to stderr for the record.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_op(fn, *args, iters=20, warmup=3, reps=1, chain=0):
    """HONEST timing: rounds 1-4 timed with `jax.block_until_ready`, which
    on the tunneled axon backend returns BEFORE device completion (measured
    r5: 50 enqueued muls "completed" in 1.9 ms, then the result download
    took 4.7 s — the actual compute). Every historical BENCH_r* throughput
    was therefore dispatch rate, not compute rate. This version forces a
    RESULT DOWNLOAD after the timed batch (downloads cannot outrun the
    data), and chains ops through a data dependency (`chain`: index of the
    argument to thread the output into) so iterations cannot overlap."""
    import jax

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[:1]

    out = fn(*args)
    for _ in range(warmup - 1):
        out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        a = list(args)
        for _ in range(iters):
            out = fn(*a)
            if chain is not None:
                a[chain] = out if out.shape == a[chain].shape else a[chain]
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    log("devices:", jax.devices())
    from dacapo_tpu.crypto.scheme import Scheme

    profile = "tpu_n15"
    t0 = time.time()
    s = Scheme(profile)
    log(f"context build: {time.time()-t0:.1f}s "
        f"(N=2^{s.ctx.logn}, {len(s.ctx.q_primes)}+{len(s.ctx.p_primes)} primes)")
    t0 = time.time()
    s.generate_keys(rot_steps=(1,))
    log(f"keygen: {time.time()-t0:.1f}s")

    n = s.ctx.config.n_slots
    nl = s.ctx.config.num_q
    rng = np.random.default_rng(0)
    # encode at Delta=2^60 (SEAL parity): the composite prime-pair rescale
    # divides by ~2^60, so one mul+rescale returns to 2^60 with rounding
    # noise ~2^-50 relative — the regime every managed program runs in.
    sc = 2.0 ** 60
    va, vb = rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)
    a = s.encrypt(va, scale=sc)
    b = s.encrypt(vb, scale=sc)

    ev = s.ev
    rlk = s.keys.rlk
    gk = s.keys.galois[1]

    t_mul = time_op(lambda x, y: ev.mul_ct(x, y, nl, rlk), a.data, b.data,
                    iters=40, reps=5)
    log(f"ct-ct mul+relin (L={nl}): {t_mul*1e3:.2f} ms")
    t_rot = time_op(lambda x: ev.rotate(x, nl, 1, gk), a.data)
    log(f"rotate (L={nl}): {t_rot*1e3:.2f} ms")
    t_rs = time_op(lambda x: ev.rescale(x, nl), a.data)
    log(f"rescale (L={nl}): {t_rs*1e3:.2f} ms")
    t_add = time_op(lambda x, y: ev.add_ct(x, y, nl), a.data, b.data)
    log(f"add (L={nl}): {t_add*1e3:.3f} ms")

    # per-level latency curves (the shape the planner's estimator needs;
    # VERDICT r3 asked the committed bench to carry the curve, not a point)
    rr = s.ctx.config.rescale_rows
    curve = {"levels": [], "mul_ms": [], "rotate_ms": [], "rescale_ms": []}
    for lv in range(1, s.ctx.config.num_levels):
        nli = (lv + 1) * rr
        ad, bd = a.data[:, :nli, :], b.data[:, :nli, :]
        curve["levels"].append(lv)
        curve["mul_ms"].append(round(time_op(
            lambda x, y: ev.mul_ct(x, y, nli, rlk), ad, bd, iters=10) * 1e3, 4))
        curve["rotate_ms"].append(round(time_op(
            lambda x: ev.rotate(x, nli, 1, gk), ad, iters=10) * 1e3, 4))
        curve["rescale_ms"].append(round(time_op(
            lambda x: ev.rescale_k(x, nli, rr), ad, iters=10) * 1e3, 4))
    log("per-level curve:", json.dumps(curve))

    # sanity: the benchmark op must be *correct*, not just fast
    out = s.decrypt(s.rescale(s.mul(a, b)))
    rms = float(np.sqrt(np.mean((out - va * vb) ** 2)))
    log(f"mul correctness rms: {rms:.2e}")
    assert rms < 1e-9, "benchmark op incorrect"

    baseline_s = 160732e-6        # reference SEAL-CPU mul_double @ L13
    value = 1.0 / t_mul
    print(json.dumps({
        "metric": "ctct_mul_relin_throughput_N32768_L14x60b",
        "value": round(value, 3),
        "unit": "mult/s/chip",
        "vs_baseline": round(value * baseline_s, 3),
    }))


if __name__ == "__main__":
    main()
