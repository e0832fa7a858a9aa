#!/bin/bash
# round-4 chip queue E: rotmac microbench + axon cache probe + n15b native flagship
set -u
cd /root/repo
while ps -p ${1:?pid} >/dev/null 2>&1; do sleep 30; done
bash scripts/tpu_run.sh scripts/rotmac_bench.py tpu_n15 9 2>&1 | tee _logs/rotmac_r4.log
# axon persistent-cache probe: same tiny jit in two cold processes, debug-logged
for i in 1 2; do
  JAX_DEBUG_LOG_MODULES=jax._src.compiler python - <<'PY' 2>&1 | grep -iE "persistent compilation cache" | tail -3
import time, jax, jax.numpy as jnp
@jax.jit
def f(x):
    for _ in range(20):
        x = (x * x + x) % jnp.uint32(97)
    return x
t0=time.time(); f(jnp.ones((512, 32768), jnp.uint32)).block_until_ready()
print("probe compile+run:", round(time.time()-t0, 2), "s")
PY
done 2>&1 | tee _logs/cacheprobe_r4.log
bash scripts/tpu_run.sh scripts/bootstrap_n16.py tpu_n15b 14 2>&1 | tee _logs/bootstrap_n15b_r4.log
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15b dacapo 40 2>&1 | tee _logs/resnet_n15b_r4.log
