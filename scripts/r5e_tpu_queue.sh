#!/usr/bin/env bash
# Round-5 final chain (supersedes the never-launched r5d; r5c fully
# drained at 07:36).  Spends the last TPU window on, in order:
#   0. bench.py smoke — round 5 changed the sampler dispatch
#      (conditioning-trunk fusion) and bench has not run since r4; the
#      driver's end-of-round bench MUST NOT be its first execution.
#   1. confidence gate with the PAE fix (alpha_pae was 0.0 — the PAE
#      head, sole input to ipTM/pTM/ranking_confidence, received
#      exactly zero gradient through every prior gate; reference
#      recipe tasks/unicore_train/train.sh:109 uses --alpha-pae 1)
#   2. per-stage sampler profile (r5b run 413'd on a closed-over
#      conditioning tensor; now rides as a jit argument)
#   3. generalization gate resume (deadline-cut at 809/3000, loss
#      still descending, held-out top-ranked 2.3-3.9 A)
#   4. medium 256/2048 polish resume for the remaining window (cut at
#      3250/12000; 2/4 top-ranked <2A, all 4 have sub-1A in top-5 —
#      pose mass still concentrating)
#
# One TPU process at a time; tpu_retry survives tunnel drops; every
# stage commits its artifacts immediately; HARD_END leaves the chip
# idle for the driver's end-of-round bench.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

HARD_END=${HARD_END:-$(( $(date +%s) + 14400 ))}
T0=$(date +%s)
stage() { echo "[r5e $(date +%H:%M:%S) +$(( $(date +%s)-T0 ))s] $*" >> /tmp/r5e.log; }
commit_if() {
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

stage "chain start (HARD_END=$HARD_END)"

# ---------- stage 0: bench smoke ----------
NOW=$(date +%s)
if [ $NOW -lt $(( HARD_END - 1800 )) ]; then
    scripts/tpu_retry.sh /tmp/bench_smoke.log 1800 python bench.py \
        > /tmp/bench_smoke.json 2>>/tmp/bench_smoke.log
    stage "stage0 bench smoke done (rc=$?): $(tail -c 400 /tmp/bench_smoke.json 2>/dev/null)"
    sleep 220
else
    stage "stage0 SKIPPED"
fi

# ---------- stage 1: confidence gate with the PAE fix ----------
NOW=$(date +%s)
if [ $NOW -lt $(( HARD_END - 3000 )) ]; then
    CD=$(( NOW + 2200 ))
    scripts/tpu_retry.sh /tmp/conf_gate_r5e.log 3600 \
        python scripts/confidence_finetune.py \
        --ckpt /root/repo/_overfit/ema_params.npz --steps 1500 \
        --deadline_ts $CD
    stage "stage1 confidence gate done (rc=$?)"
    commit_if "Confidence gate: train the PAE head (weight was zero)

Root cause of every constant-ipTM confidence gate since round 3:
LossConfig.alpha_pae defaulted to 0.0 (the reference RELEASE config),
so the PAE head — the sole input to ipTM/pTM/ranking_confidence —
received exactly zero gradient; the pLDDT/PDE heads trained fine at
weight 1e-4, but a weight of literally zero kills the path.  The
reference confidence recipe trains with --alpha-pae 1
(tasks/unicore_train/train.sh:109).  Re-run the corrupted-pose gate
with the PAE loss live and commit the trained ranker weights." \
        CONFIDENCE_GATE.json _confidence/ema_params_conf.npz
    sleep 220
else
    stage "stage1 SKIPPED"
fi

# ---------- stage 2: per-stage sampler profile (413 fix) ----------
NOW=$(date +%s)
if [ $NOW -lt $(( HARD_END - 2400 )) ]; then
    scripts/tpu_retry.sh /tmp/stage_profile_r5e.log 1800 \
        python scripts/tpu_sampler_profile.py
    stage "stage2 sampler profile done (rc=$?)"
    commit_if "Per-stage sampler profile: pass conditioning tensors as jit args

The r5b run died with HTTP 413 from the tunnel's remote-compile: the
bias_cache stage closed over the atom-pair conditioning tensor, baking
it into the compile payload as a literal.  Ride it as a jit argument
like every other stage." \
        STAGE_PROFILE.json
    sleep 220
else
    stage "stage2 SKIPPED"
fi

# ---------- stage 3: generalization gate resume ----------
NOW=$(date +%s)
if [ $NOW -lt $(( HARD_END - 3600 )) ]; then
    GD=$(( NOW + 2700 ))
    [ $GD -gt $(( HARD_END - 3300 )) ] && GD=$(( HARD_END - 3300 ))
    scripts/tpu_retry.sh /tmp/gen_gate_r5e.log $(( GD - NOW + 1500 )) \
        python scripts/generalization_gate.py --ckpt_every 250 \
        --deadline_ts $GD
    stage "stage3 generalization gate done (rc=$?)"
    commit_if "Generalization gate: resume training toward the 3000-step budget

The r5b run was deadline-cut at step 809/3000 with the loss still
descending and held-out top-ranked docks at 2.3-3.9 A; resume from the
orbax checkpoint and re-dock." \
        GENERALIZATION_GATE.json _generalization/ema_params_gen.npz
    sleep 220
else
    stage "stage3 SKIPPED"
fi

# ---------- stage 4: medium 256/2048 polish for the rest ----------
NOW=$(date +%s)
if [ $NOW -lt $(( HARD_END - 2400 )) ]; then
    D1=$(( HARD_END - 1900 ))          # leave room for the dock + npz
    scripts/tpu_retry.sh /tmp/overfit_medium256e.log $(( HARD_END - NOW + 600 )) \
        python scripts/overfit_gate.py --model medium --steps 12000 \
        --crop 256 --atom_crop 2048 --lr 3e-4 \
        --ckpt_every 250 --deadline_ts $D1 \
        --out /root/repo/_overfit_medium256 \
        --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
    stage "stage4 medium-256 polish done (rc=$?)"
    commit_if "Medium 256/2048 gate: continue the polish window

Resume the flagship run (cut at 3250/12000 with the loss still
descending; 2/4 top-ranked <2A, all 4 systems with sub-1A poses in
top-5) so the pose distribution keeps concentrating on the GT basin,
then re-run the full guided redocking gate." \
        OVERFIT_GATE_MEDIUM.json _overfit_medium256/ema_params.npz
else
    stage "stage4 SKIPPED"
fi

stage "chain ALL DONE (chip idle from here)"
touch /tmp/r5e_chain_done
