#!/usr/bin/env bash
# Round-3 TPU job chain: wait for the confidence fine-tune, then the
# bf16-carry drift probe, then one bench pass. One TPU process at a time
# with cooldowns; each stage rides tpu_retry's tunnel-wait.
set -u
cd /root/repo

if [ -f /tmp/conf_ft.pid ]; then
    while kill -0 "$(cat /tmp/conf_ft.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 200
scripts/tpu_retry.sh /tmp/bf16_drift.log 3600 python scripts/bf16_drift_tpu.py
sleep 200
scripts/tpu_retry.sh /tmp/bench_r3_check.log 3600 python bench.py
echo "[r3_queue] done" >> /tmp/r3_queue.log
