#!/usr/bin/env bash
# Follow-on TPU job: wait for r3_tpu_queue3.sh, then upgrade the accuracy
# evidence from toy to the FLAGSHIP (medium) config — overfit-train medium
# on the 4 PoseBusters demo systems and run the full guided redock gate.
# Auto-resumes from _overfit_medium/ckpts across tunnel retries.
set -u
cd /root/repo

if [ -f /tmp/r3_queue3.pid ]; then
    while kill -0 "$(cat /tmp/r3_queue3.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 200
scripts/tpu_retry.sh /tmp/overfit_medium.log 14400 \
    python scripts/overfit_gate.py --model medium --steps 2500 \
    --ckpt_every 500 --eval_every 1250 \
    --out /root/repo/_overfit_medium \
    --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
echo "[r3_queue4] done" >> /tmp/r3_queue.log
