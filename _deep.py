"""Small dacapo-on-tpu_n15 repro: deep mul chain forcing bootstraps."""
import numpy as np, time
import dacapo_tpu as hc
from examples.common import trace_and_save, compile_traced, run_test

rng = np.random.default_rng(0)
n = 2**14
w = rng.uniform(0.9, 1.1, n)

def body(x):
    acc = x
    for i in range(24):            # depth 24 >> 14 levels -> bootstraps
        acc = acc * hc.Plain(w)
        if i % 3 == 2:
            acc = acc + x.rotate(i % 5 + 1)
    return acc

trace_and_save("Deep", "c", body, dirs="/tmp/deep")
x = rng.uniform(-1, 1, n)
want = x.copy()
for i in range(24):
    want = want * w
    if i % 3 == 2:
        want = want + np.roll(x, -(i % 5 + 1))
t0=time.time()
res, lat, rms = run_test("Deep", "dacapo", 28, "tpu_n15", [x], want,
                         traced_dir="/tmp/deep", out_dir="/tmp/deep/opt")
print("wall:", time.time()-t0)
