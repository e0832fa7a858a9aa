#!/bin/bash
# round-4 chip queue H: native-bootstrap flagship (tpu_n15b) — VERDICT r3 #1.
# The runner auto-enables NativeBootstrapper on this profile, so the 19
# planner bootstraps run the real CtS/EvalMod/StC pipeline (no secret key
# on the server path), with per-boot attribution from segprof.
set -u
cd /root/repo
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15b dacapo 40 2>&1 | tee _logs/resnet_n15b_r4.log
