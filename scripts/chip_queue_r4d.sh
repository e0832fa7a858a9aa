#!/bin/bash
# round-4 chip queue D: flagship with struct-dedup + throttle, then n16 bootstrap
set -u
cd /root/repo
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15 dacapo 40 2>&1 | tee _logs/resnet_r4c.log
# cold-process repeat: persistent-cache / steady-state check
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15 dacapo 40 2>&1 | tee _logs/resnet_r4d.log
bash scripts/tpu_run.sh scripts/bootstrap_n16.py tpu_n16 6 2>&1 | tee _logs/bootstrap_n16_r4c.log
