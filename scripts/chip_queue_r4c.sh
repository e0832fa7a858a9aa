#!/bin/bash
# round-4 chip queue C: flagship attribution + cache A/B + fixed n16 bootstrap
set -u
cd /root/repo
# wait for queue B to release the chip
while ps -p ${1:?pid} >/dev/null 2>&1; do sleep 30; done
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15 dacapo 40 2>&1 | tee _logs/resnet_r4a.log
# second cold process: persistent-cache A/B (warmup should collapse if cache hits)
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15 dacapo 40 2>&1 | tee _logs/resnet_r4b.log
bash scripts/tpu_run.sh scripts/bootstrap_n16.py tpu_n16 6 2>&1 | tee _logs/bootstrap_n16_r4c.log
