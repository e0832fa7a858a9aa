"""Encrypted benchmark sweep — the reference's test_benchmarks.sh analog
(reference script/test_benchmarks.sh:40-130 runs basic+deep lists through
hc-test recording latency+RMS). Appends one JSON line per benchmark to
docs/BENCH_SWEEP.jsonl.

Usage: bench_sweep.py [names...]   (default: the basic list)
Env: SWEEP_PROFILE / SWEEP_PIPELINE / SWEEP_WATERLINE / SWEEP_NT override
per-benchmark defaults (deep CNNs are run at tpu_n15/nt=2^14 by default
here — one shared keyset with the flagship, same regime as the reference's
N=2^15 SEAL runs).
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASIC = ["LinearRegression", "PolynomialRegression", "Multivariate",
         "SobelFilter", "HarrisCornerDetection", "MLP"]
DEEP = ["SqueezeNet", "AlexNet", "MobileNet", "VGG16"]

# deep CNNs: run in the flagship regime (shared tpu_n15 keyset, nt=2^14)
DEEP_KW = dict(profile="tpu_n15", nt=2 ** 14, pipeline="dacapo", waterline=40)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "BENCH_SWEEP.jsonl")

names = sys.argv[1:] or BASIC
for name in names:
    kw = dict(DEEP_KW) if name in DEEP else {}
    for k, env in (("profile", "SWEEP_PROFILE"), ("pipeline", "SWEEP_PIPELINE")):
        if os.environ.get(env):
            kw[k] = os.environ[env]
    if os.environ.get("SWEEP_WATERLINE"):
        kw["waterline"] = int(os.environ["SWEEP_WATERLINE"])
    if os.environ.get("SWEEP_NT"):
        kw["nt"] = int(os.environ["SWEEP_NT"])
    t0 = time.time()
    doc = {"bench": name, "date": time.strftime("%Y-%m-%d"), **kw}
    try:
        mod = __import__(f"examples.tests.{name}", fromlist=["run"])
        res, latency, rms = mod.run(**kw)
        doc.update(latency_s=round(float(latency), 3), rms=float(rms),
                   wall_s=round(time.time() - t0, 1), ok=True)
    except Exception as e:
        traceback.print_exc()
        doc.update(ok=False, error=repr(e), wall_s=round(time.time() - t0, 1))
    line = json.dumps(doc)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")
