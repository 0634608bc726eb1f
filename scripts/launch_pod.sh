#!/usr/bin/env bash
# Launch on every host of a TPU pod slice (the reference's ssh/DMLC
# launcher is unnecessary: one process per host, same command).
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all \
#     --command="cd simpledet-tpu && bash scripts/launch_pod.sh config/faster_r50v1_fpn_1x.py"
set -e
CONFIG=${1:?usage: launch_pod.sh <config.py>}
export SIMPLEDET_DISTRIBUTED=1
python detection_train.py --config "$CONFIG"
