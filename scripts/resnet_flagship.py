"""Flagship run: ResNet-20 dacapo/40 on the real chip with per-segment
attribution (VERDICT r3 #2/#4/#5).

Usage: resnet_flagship.py [profile] [pipeline] [waterline]
Emits one JSON line on stdout (latency, rms, warmup, preencode, breakdown)
and appends it to docs/RESNET_RESULTS.jsonl for the record.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("DACAPO_TPU_SEGPROF", "1")

profile = sys.argv[1] if len(sys.argv) > 1 else "tpu_n15"
pipeline = sys.argv[2] if len(sys.argv) > 2 else "dacapo"
waterline = int(sys.argv[3]) if len(sys.argv) > 3 else 40

t00 = time.time()
from examples.tests.ResNet import run  # noqa: E402

res, latency, rms = run(pipeline, waterline, profile)

# segprof data lives on the executor of the module-level HEVM the test built
from dacapo_tpu.runtime import runner as _runner  # noqa: E402

doc = {
    "bench": "ResNet",
    "pipeline": pipeline,
    "waterline": waterline,
    "profile": profile,
    "latency_s": round(float(latency), 3),
    "rms": float(rms),
    "wall_s": round(time.time() - t00, 1),
    "date": time.strftime("%Y-%m-%d"),
}
prof = getattr(getattr(_runner, "_LAST_EXECUTOR", None), "seg_profile", None)
if prof:
    by_kind = {}
    for p in prof:
        k = by_kind.setdefault(p["kind"], [0.0, 0])
        k[0] += p["s"]
        k[1] += 1
    doc["breakdown"] = {k: {"s": round(v[0], 2), "n": v[1]}
                        for k, v in by_kind.items()}
    doc["top_windows"] = [
        {"wi": p["wi"], "kind": p["kind"], "ops": p["ops"], "s": round(p["s"], 3)}
        for p in sorted(prof, key=lambda p: -p["s"])[:10]]

line = json.dumps(doc)
print(line)
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "RESNET_RESULTS.jsonl"), "a") as f:
    f.write(line + "\n")
