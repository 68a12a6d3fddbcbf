#!/usr/bin/env bash
# Round-3 session-6 TPU chain (a machine restore wiped /tmp before the
# r3s5 chain ever ran). Time-boxed: the flagship medium accuracy gate
# trains under a wall-clock deadline (--deadline_ts), always reaching its
# dock phase and artifact; the toy confidence fine-tune runs only if
# enough budget remains. Artifact-only commits right after each stage so
# another restore cannot eat the evidence. One TPU process at a time;
# 200 s cooldowns; tpu_retry handles tunnel drops and stalls (retries
# auto-resume from orbax checkpoints and re-respect the same deadline).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

T0=$(date +%s)
stage() { echo "[r3s6 $(date +%H:%M:%S) +$((`date +%s`-T0))s] $*" >> /tmp/r3s6.log; }
stage start

# 1. flagship (medium) accuracy gate — training stops at T0+1700 no
#    matter what; dock phase + artifact follow.
scripts/tpu_retry.sh /tmp/overfit_medium.log 2700 \
    python scripts/overfit_gate.py --model medium --steps 2500 \
    --ckpt_every 250 --deadline_ts $((T0 + 1700)) \
    --out /root/repo/_overfit_medium \
    --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
stage "medium gate done ($?)"
if [ -f OVERFIT_GATE_MEDIUM.json ]; then
    git add -f OVERFIT_GATE_MEDIUM.json
    git commit -q -m "Flagship-config accuracy gate: medium-model closed loop

Deadline-bounded overfit of the medium (flagship) config on the 4
PoseBusters demo systems, then the full guided redocking pipeline;
records top-ranked ligand RMSD per system (gate: < 2 A).

No-Verification-Needed: artifact-only commit from the TPU job chain" \
        && stage "medium gate committed" || stage "medium commit failed"
fi
sleep 200

# 2. toy confidence fine-tune + discrimination ladder — only with budget
#    left (driver bench must find the TPU idle at round end)
if [ $(( $(date +%s) - T0 )) -lt 2300 ]; then
    scripts/tpu_retry.sh /tmp/conf_ft.log 1800 python scripts/confidence_finetune.py
    stage "confidence ft done ($?)"
    if [ -f _confidence/ema_params_conf.npz ]; then
        git add -f CONFIDENCE_GATE.json _confidence/ema_params_conf.npz
        git commit -q -m "Confidence gate rerun: commit the fine-tuned head weights

Rerun on TPU with the rollout-length mix (12/4/2) and the displaced-pose
discrimination probe; commits the fine-tuned head weights as a flat
fp16 .npz so the trained-confidence demo survives machine restores.

No-Verification-Needed: artifact-only commit from the TPU job chain" \
            && stage "conf artifacts committed" || stage "conf commit failed"
    fi
else
    stage "skipping confidence ft (budget)"
fi

stage "ALL DONE"
