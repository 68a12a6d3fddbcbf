#!/usr/bin/env bash
# Follow-on TPU job: wait for r3_tpu_queue4.sh (medium gate), then
# regenerate the confidence-head weights (lost with the restore) by
# fine-tuning on the fresh toy gate checkpoint, re-gating discrimination.
set -u
cd /root/repo

if [ -f /tmp/r3_queue4.pid ]; then
    while kill -0 "$(cat /tmp/r3_queue4.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 200
scripts/tpu_retry.sh /tmp/conf_ft.log 7200 \
    python scripts/confidence_finetune.py
echo "[r3_queue5] done" >> /tmp/r3_queue.log
