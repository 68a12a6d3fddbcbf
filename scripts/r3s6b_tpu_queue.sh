#!/usr/bin/env bash
# Round-3 session-6 continuation: the deadline-bounded medium gate reached
# step 1159/2500 with top-ranked RMSD 2.2-2.9 A (gate < 2 A) — clearly
# converging. Resume training for one more bounded window (orbax
# auto-resume; XLA persistent cache makes the restart cheap), re-dock,
# and re-commit the artifact. TPU left idle afterwards.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
T0=$(date +%s)
stage() { echo "[r3s6b $(date +%H:%M:%S) +$((`date +%s`-T0))s] $*" >> /tmp/r3s6.log; }
stage start

scripts/tpu_retry.sh /tmp/overfit_medium.log 2100 \
    python scripts/overfit_gate.py --model medium --steps 2500 \
    --ckpt_every 250 --deadline_ts $((T0 + 1080)) \
    --out /root/repo/_overfit_medium \
    --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
stage "medium gate continuation done ($?)"
if [ -f OVERFIT_GATE_MEDIUM.json ]; then
    git add -f OVERFIT_GATE_MEDIUM.json
    git commit -q -m "Medium accuracy gate: resumed training window + re-dock

Second deadline-bounded window resumes the flagship-config overfit from
step 1159 (2.2-2.9 A top-ranked) and re-runs the full guided redocking
pipeline, updating the gate artifact.

No-Verification-Needed: artifact-only commit from the TPU job chain" \
        && stage "medium gate recommitted" || stage "medium recommit failed"
fi
stage "ALL DONE b"
