#!/usr/bin/env bash
# Round-3 session-4 TPU chain. The machine restore wiped the gitignored
# _overfit/_confidence checkpoints (again), so: regenerate the toy gate
# weights and this time export the committable flat .npz artifact, then
# run everything that depends on trained weights, then the flagship
# (medium) accuracy gate, then the remaining perf measurements.
# One TPU process at a time; 200 s cooldowns; tpu_retry handles tunnel
# drops. Stages log to /tmp/r3s4.log; per-stage logs in /tmp.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

stage() { echo "[r3s4 $(date +%H:%M:%S)] $*" >> /tmp/r3s4.log; }

stage "start"

# 1. toy closed-loop gate (regenerates _overfit ckpts + ema_params.npz)
scripts/tpu_retry.sh /tmp/overfit_r3s4.log 10800 \
    python scripts/overfit_gate.py --steps 6000
stage "toy gate done ($?)"
sleep 200

# 2. bf16-carry drift probe against the trained weights (ADVICE r2 #2)
scripts/tpu_retry.sh /tmp/bf16_drift.log 3600 python scripts/bf16_drift_tpu.py
stage "bf16 drift done ($?)"
sleep 200

# 3. confidence-head fine-tune + discrimination gate (+ npz artifact)
scripts/tpu_retry.sh /tmp/conf_ft.log 7200 python scripts/confidence_finetune.py
stage "confidence ft done ($?)"
sleep 200

# 4. flagship (medium) accuracy gate — auto-resumes across retries
scripts/tpu_retry.sh /tmp/overfit_medium.log 14400 \
    python scripts/overfit_gate.py --model medium --steps 2500 \
    --ckpt_every 250 --eval_every 1250 \
    --out /root/repo/_overfit_medium \
    --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
stage "medium gate done ($?)"
sleep 200

# 5. no-crop blind-docking compile bill across two fresh processes
#    (VERDICT r2 item 10 done-condition: second process pays ~0 compile)
scripts/tpu_retry.sh /tmp/nocrop_p1.log 3600 python scripts/tpu_nocrop_dock.py
stage "nocrop p1 done ($?)"
sleep 200
scripts/tpu_retry.sh /tmp/nocrop_p2.log 3600 python scripts/tpu_nocrop_dock.py
stage "nocrop p2 done ($?)"
sleep 200

# 6. bench pass (load_detail attribution of the pass-leading stall)
scripts/tpu_retry.sh /tmp/bench_r3s4.log 3600 python bench.py
stage "bench done ($?)"
sleep 200

# 7. sampler-stage profiler (e2e-MFU vs kernel-MFU gap attribution)
scripts/tpu_retry.sh /tmp/sampler_prof.log 3600 \
    python scripts/tpu_sampler_profile.py
stage "sampler profile done ($?)"

stage "ALL DONE"
