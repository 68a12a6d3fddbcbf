#!/usr/bin/env bash
# Round-5 continuation TPU chain. The machine restore killed the first
# r5 chain before any stage finished (untracked orbax ckpts + /tmp logs
# wiped; only git-tracked npz artifacts survived), so every gate re-runs
# here with the masked-row backward fix (471ffa2) in.
#
# Stages (one TPU process at a time; tpu_retry handles tunnel drops and
# inserts its own cooldowns; 200 s sleeps between stages):
#   1. flagship medium 256/2048 gate, trained FROM SCRATCH  (VERDICT r4 #2)
#   2. generalization gate on held-out synthetic systems    (VERDICT r4 #3)
#   3. confidence gate, corrupted-pose head finetune        (VERDICT r4 #4)
#   4. if time remains: bf16 drift @ medium, per-stage sampler profile
# Every stage commits its artifacts immediately so a mid-chain kill
# still lands whatever finished.  Nothing starts after T0+15600 and the
# chain is sized to leave the chip idle for the driver's bench.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

T0=$(date +%s)
stage() { echo "[r5b $(date +%H:%M:%S) +$(( $(date +%s)-T0 ))s] $*" >> /tmp/r5b.log; }
commit_if() { # commit_if MSG PATHS...
    local msg=$1; shift
    git add -f "$@" 2>/dev/null
    if ! git diff --cached --quiet; then
        git commit -q -m "$msg

No-Verification-Needed: artifact-only commit from the TPU job chain" \
            && stage "committed: $msg" || stage "COMMIT FAILED: $msg"
    else
        stage "nothing to commit for: $msg"
    fi
}

stage "chain start (T0=$T0)"

# ---------- stage 1: medium 256/2048 from scratch ----------
D1=$(( T0 + 7800 ))   # training deadline ~2h10m; dock phase follows
scripts/tpu_retry.sh /tmp/overfit_medium256.log 12000 \
    python scripts/overfit_gate.py --model medium --steps 4500 \
    --crop 256 --atom_crop 2048 \
    --ckpt_every 250 --deadline_ts $D1 \
    --out /root/repo/_overfit_medium256 \
    --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
stage "stage1 medium-256 gate done (rc=$?)"

if [ -f _overfit_medium256/ema_params.npz ]; then
    # the old _overfit_medium npz is the r4 kernel-bug plateau artifact;
    # the from-scratch post-fix weights supersede it regardless of gate
    # outcome (VERDICT r4 weak #2: "a failing artifact")
    git rm -q --cached _overfit_medium/ema_params.npz 2>/dev/null
    rm -f _overfit_medium/ema_params.npz
    commit_if "Flagship medium gate retrained from scratch at crop 256/2048 post kernel fix

The round-4/5 plateau at this crop was the masked-row fused-attention
backward bug (471ffa2); with the fix in, retrain medium from scratch at
the flagship crop and re-run the full guided redocking gate.  The fp16
EMA weights replace the plateaued round-4 artifact." \
        OVERFIT_GATE_MEDIUM.json _overfit_medium256/ema_params.npz
else
    commit_if "Flagship medium gate artifact (no npz produced)" OVERFIT_GATE_MEDIUM.json
fi
sleep 200

# ---------- stage 2: generalization gate ----------
NOW=$(date +%s)
if [ $NOW -lt $(( T0 + 14400 )) ]; then
    GD=$(( NOW + 2700 ))
    [ $GD -gt $(( T0 + 14700 )) ] && GD=$(( T0 + 14700 ))
    TMO=$(( GD - NOW + 2700 ))
    scripts/tpu_retry.sh /tmp/gen_gate.log $TMO \
        python scripts/generalization_gate.py --deadline_ts $GD
    stage "stage2 generalization gate done (rc=$?)"
    commit_if "Generalization gate: dock held-out systems never trained on" \
        GENERALIZATION_GATE.json
    sleep 200
else
    stage "stage2 SKIPPED (out of window)"
fi

# ---------- stage 3: confidence gate (corrupted-pose recipe) ----------
NOW=$(date +%s)
if [ $NOW -lt $(( T0 + 15600 )) ]; then
    CD=$(( NOW + 1800 ))
    [ $CD -gt $(( T0 + 15900 )) ] && CD=$(( T0 + 15900 ))
    TMO=$(( CD - NOW + 2400 ))
    scripts/tpu_retry.sh /tmp/conf_gate.log $TMO \
        python scripts/confidence_finetune.py \
        --ckpt /root/repo/_overfit/ema_params.npz --deadline_ts $CD
    stage "stage3 confidence gate done (rc=$?)"
    commit_if "Confidence gate retrained with the corrupted-pose recipe" \
        CONFIDENCE_GATE.json
    sleep 200
else
    stage "stage3 SKIPPED (out of window)"
fi

# ---------- stage 4 (best effort): bf16 drift @ medium ----------
NOW=$(date +%s)
if [ $NOW -lt $(( T0 + 15600 )) ] && [ -f _overfit_medium256/ema_params.npz ]; then
    scripts/tpu_retry.sh /tmp/bf16_drift.log 1800 \
        python scripts/bf16_drift_tpu.py /root/repo/_overfit_medium256/ema_params.npz \
        --model medium --crop 256 --atom_crop 2048
    stage "stage4 bf16 drift done (rc=$?)"
    commit_if "bf16-carry drift measured at medium scale" BF16_DRIFT.json
    sleep 200
fi

# ---------- stage 5 (best effort): per-stage sampler profile ----------
NOW=$(date +%s)
if [ $NOW -lt $(( T0 + 15900 )) ]; then
    scripts/tpu_retry.sh /tmp/stage_profile.log 2400 \
        python scripts/tpu_sampler_profile.py
    stage "stage5 sampler profile done (rc=$?)"
    commit_if "Per-stage sampler profile re-run with honest fori_loop timing" \
        STAGE_PROFILE.json
fi

stage "chain ALL DONE"
touch /tmp/r5b_chain_done
