#!/bin/bash
# round-4 chip queue G (fresh env): rotmac microbench at orbit layout, then
# the flagship with trained weights + orbit-layout rotations.
set -u
cd /root/repo
bash scripts/tpu_run.sh scripts/rotmac_bench.py tpu_n15 9 2>&1 | tee _logs/rotmac_r4.log
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15 dacapo 40 2>&1 | tee _logs/resnet_trained_r4.log
