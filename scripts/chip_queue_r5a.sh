#!/bin/bash
# round-5 chip queue A: waits for the window probe, then
#  1. isolated window latency probe (in-graph decode ON)
#  2. single-chip batched throughput (multichip dp unit)
#  3. basic benchmark sweep (reference test_benchmarks.sh basic list)
#  4. flagship rerun with in-graph decode (latency+rms)
#  5. native bootstrap standalone at n15b
set -u
cd /root/repo
while ps -p ${1:?pid} >/dev/null 2>&1; do sleep 30; done
bash scripts/tpu_run.sh scripts/window_isolate.py tpu_n15 dacapo 40 6 \
    2>&1 | tee _logs/window_isolate_r5.log
bash scripts/tpu_run.sh scripts/multichip_scaling.py tpu tpu_n15 \
    2>&1 | tee _logs/multichip_tpu_r5.log
bash scripts/tpu_run.sh scripts/bench_sweep.py \
    2>&1 | tee _logs/bench_sweep_basic_r5.log
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15 dacapo 40 \
    2>&1 | tee _logs/resnet_ingraph_r5.log
bash scripts/tpu_run.sh scripts/bootstrap_n16.py tpu_n15b 14 \
    2>&1 | tee _logs/bootstrap_n15b_r5.log
echo "[queue r5a] done"
