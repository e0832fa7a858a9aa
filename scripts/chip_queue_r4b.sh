#!/bin/bash
# round-4 chip queue B: n16 native bootstrap evidence + remaining profiles
set -u
cd /root/repo
bash scripts/tpu_run.sh scripts/bootstrap_n16.py tpu_n16 6 2>&1 | tee _logs/bootstrap_n16_r4b.log
bash scripts/tpu_run.sh -m dacapo_tpu.cli profile tpu_n15_sec 2>&1 | tee _logs/prof_n15sec_r4.log
bash scripts/tpu_run.sh -m dacapo_tpu.cli profile tpu_n15 2>&1 | tee _logs/prof_n15_r4b.log
bash scripts/tpu_run.sh -m dacapo_tpu.cli profile tpu_n14 2>&1 | tee _logs/prof_n14_r4b.log
