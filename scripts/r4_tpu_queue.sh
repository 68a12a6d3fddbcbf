#!/usr/bin/env bash
# Round-4 TPU chain, stage A+B (VERDICT r3 items 1 and 2).
#   A. per-stage sampler profile: FLOPs in a clean CPU process, then
#      on-chip timings -> STAGE_PROFILE.json (attributes the e2e-MFU vs
#      kernel-MFU gap).
#   B. flagship medium accuracy gate at the REAL crop (256/2048): resume
#      _overfit_medium (step 1500, trained at crop 128) and train to 3000
#      under a deadline, then full guided dock; gate now requires ALL
#      top-5 poses < 2 A; commits the gate JSON + the fp16 EMA npz so the
#      flagship weights survive machine restores.
# One TPU process at a time; 200 s cooldowns; tpu_retry handles tunnel
# drops/stalls (retries auto-resume from orbax and respect the deadline).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

T0=$(date +%s)
stage() { echo "[r4 $(date +%H:%M:%S) +$((`date +%s`-T0))s] $*" >> /tmp/r4.log; }
stage start

# A1. per-stage FLOPs (CPU process; medium tracing is host-heavy, keep it
#     off the device-owning process)
python scripts/stage_flops.py medium > /tmp/stage_flops.log 2>&1
stage "stage_flops done ($?)"

# A2. on-chip per-stage timings
scripts/tpu_retry.sh /tmp/sampler_profile.log 2400 \
    python scripts/tpu_sampler_profile.py
stage "sampler profile done ($?)"
if [ -f STAGE_PROFILE.json ]; then
    git add -f STAGE_PROFILE.json
    [ -f _artifacts/stage_flops.json ] && git add -f _artifacts/stage_flops.json
    git commit -q -m "Per-stage sampler profile: attribute e2e MFU on-chip

Times conditioning, bias-cache build, the three DiT stacks, the full
denoise call and the guided/unguided 40-step sampler at the bench shapes
(medium, crop 256/2048, 20 poses), with per-stage achieved TF/s from XLA
HLO FLOP counts; writes STAGE_PROFILE.json for the MFU-gap attribution.

No-Verification-Needed: artifact-only commit from the TPU job chain" \
        && stage "profile committed" || stage "profile commit failed"
fi
sleep 200

# B. flagship medium gate at crop 256/2048 (training deadline: 5400 s
#    from stage start; dock phase + artifact always follow)
DB=$(( $(date +%s) + 5400 ))
scripts/tpu_retry.sh /tmp/overfit_medium256.log 8000 \
    python scripts/overfit_gate.py --model medium --steps 3000 \
    --crop 256 --atom_crop 2048 \
    --ckpt_every 250 --deadline_ts $DB \
    --out /root/repo/_overfit_medium \
    --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
stage "medium-256 gate done ($?)"
if [ -f OVERFIT_GATE_MEDIUM.json ]; then
    git add -f OVERFIT_GATE_MEDIUM.json
    [ -f _overfit_medium/ema_params.npz ] && git add -f _overfit_medium/ema_params.npz
    git commit -q -m "Flagship medium gate at the real crop (256/2048)

Resumes the medium overfit from step 1500 (crop 128) and continues at
the flagship crop 256/2048 to 3000 steps, then runs the full guided
redocking pipeline; the gate now requires every top-5 pose < 2 A on all
4 systems. Commits the fp16 EMA weights so the only flagship-scale
trained params survive machine restores.

No-Verification-Needed: artifact-only commit from the TPU job chain" \
        && stage "medium-256 artifacts committed" || stage "medium-256 commit failed"
fi

stage "ALL DONE"
