#!/usr/bin/env bash
# Round-5 TPU chain, stage 1 (VERDICT r4 item 2): flagship medium gate at
# crop 256/2048, trained FROM SCRATCH.
#
# Round 4 resumed the crop-128 checkpoint at 256/2048 and plateaued at
# loss ~100-200 (OVERFIT_GATE_MEDIUM.json pass:false); the on-chip diag
# (scripts/diag_medium256.py, /tmp/diag256.log) showed near-identical
# per-system losses (6.21/6.22/6.21) — the resumed model barely conditions
# on its input.  The crop-128 run trained from scratch converged 639->13.7
# in 250 steps, so this stage retrains from scratch at the flagship crop in
# a FRESH out dir (auto-resume inside the dir keeps tunnel retries from
# starting over, but nothing is inherited from the crop-128 lineage).
#
# One TPU process at a time; 200 s cooldowns; tpu_retry handles tunnel
# drops/stalls.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

T0=$(date +%s)
stage() { echo "[r5 $(date +%H:%M:%S) +$((`date +%s`-T0))s] $*" >> /tmp/r5.log; }
stage "stage1 start"

# training deadline: 4.5 h from launch; the dock phase + gate artifact
# always follow (deadline only stops the training loop)
DB=$(( $(date +%s) + 16200 ))
scripts/tpu_retry.sh /tmp/overfit_medium256_scratch.log 20000 \
    python scripts/overfit_gate.py --model medium --steps 4500 \
    --crop 256 --atom_crop 2048 \
    --ckpt_every 250 --deadline_ts $DB \
    --out /root/repo/_overfit_medium256 \
    --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
stage "medium-256 from-scratch gate done ($?)"

if [ -f OVERFIT_GATE_MEDIUM.json ]; then
    git add -f OVERFIT_GATE_MEDIUM.json
    [ -f _overfit_medium256/ema_params.npz ] && git add -f _overfit_medium256/ema_params.npz
    git commit -q -m "Flagship medium gate retrained from scratch at crop 256/2048

The round-4 run resumed crop-128 weights at the flagship crop and
plateaued (per-system losses nearly identical across systems — the
resumed model stopped conditioning on input).  Retrain medium from
scratch at 256/2048 and re-run the full guided redocking gate; commit
the fp16 EMA weights so the flagship-scale params survive machine
restores.

No-Verification-Needed: artifact-only commit from the TPU job chain" \
        && stage "medium-256 artifacts committed" || stage "medium-256 commit failed"
fi
stage "stage1 ALL DONE"
