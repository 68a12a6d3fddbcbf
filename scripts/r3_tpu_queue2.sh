#!/usr/bin/env bash
# Follow-on TPU jobs: wait for r3_tpu_queue.sh (drift probe + bench), then
# run the sampler-stage profiler.  One TPU process at a time + cooldowns.
set -u
cd /root/repo

if [ -f /tmp/r3_queue.pid ]; then
    while kill -0 "$(cat /tmp/r3_queue.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 200
scripts/tpu_retry.sh /tmp/sampler_prof.log 3600 python scripts/tpu_sampler_profile.py
echo "[r3_queue2] done" >> /tmp/r3_queue.log
