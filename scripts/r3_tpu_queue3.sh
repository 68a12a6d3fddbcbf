#!/usr/bin/env bash
# Round-3 session-3 TPU chain (machine restore wiped the gitignored
# _overfit checkpoints): re-run the closed-loop accuracy gate to
# regenerate trained weights, then the bf16-carry drift probe (ADVICE r2
# medium #2) against them, then a bench pass (load_detail attribution),
# then the sampler-stage profiler.  One TPU process at a time + cooldowns.
set -u
cd /root/repo

scripts/tpu_retry.sh /tmp/overfit_r3.log 10800 \
    python scripts/overfit_gate.py --steps 6000
sleep 200
scripts/tpu_retry.sh /tmp/bf16_drift.log 3600 python scripts/bf16_drift_tpu.py
sleep 200
scripts/tpu_retry.sh /tmp/bench_r3s3.log 3600 python bench.py
sleep 200
scripts/tpu_retry.sh /tmp/sampler_prof.log 3600 \
    python scripts/tpu_sampler_profile.py
echo "[r3_queue3] done" >> /tmp/r3_queue.log
