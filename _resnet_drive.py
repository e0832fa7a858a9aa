import time, sys
t0=time.time()
from examples.tests.ResNet import run
res, latency, rms = run("dacapo", 40, "tpu_n15")
print(f"TOTAL wall {time.time()-t0:.1f}s run_latency {latency:.2f}s rms {rms:.3e}", flush=True)
