#!/bin/bash
# round-4 chip queue F: flagship with TRAINED weights (RMS bar attempt)
set -u
cd /root/repo
while ps -p ${1:?pid} >/dev/null 2>&1; do sleep 30; done
# stale artifacts: the trace's constants changed (trained weights), so the
# compiled bytecode's cst indices must be regenerated together
rm -f optimized/dacapo/ResNet.40.* traced/ResNet.eir.json traced/_hecate_ResNet.cst
bash scripts/tpu_run.sh scripts/resnet_flagship.py tpu_n15 dacapo 40 2>&1 | tee _logs/resnet_trained_r4.log
