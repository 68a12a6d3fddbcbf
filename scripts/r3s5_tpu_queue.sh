#!/usr/bin/env bash
# Round-3 session-5 TPU chain. The 09:04 machine restore wiped /tmp and
# the gitignored checkpoints; r3s4 stages 1-2 (toy gate + bf16 drift) are
# committed. This chain runs the rest: confidence fine-tune (now loading
# the committed _overfit/ema_params.npz), the flagship medium accuracy
# gate, the no-crop two-process compile bill, a bench pass with load
# attribution, and the sampler-stage profiler. Artifact-only commits
# happen right after each gate so another restore cannot eat the
# evidence. One TPU process at a time; 200 s cooldowns; tpu_retry
# handles tunnel drops and stalls.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

stage() { echo "[r3s5 $(date +%H:%M:%S)] $*" >> /tmp/r3s5.log; }
stage start

# 1. confidence fine-tune + discrimination ladder (writes
#    CONFIDENCE_GATE.json + _confidence/ema_params_conf.npz)
scripts/tpu_retry.sh /tmp/conf_ft.log 7200 python scripts/confidence_finetune.py
stage "confidence ft done ($?)"
if [ -f _confidence/ema_params_conf.npz ]; then
    git add -f CONFIDENCE_GATE.json _confidence/ema_params_conf.npz
    git commit -q -m "Confidence gate rerun: rollout-mix training + shift-ladder discrimination

Rerun on TPU with the rollout-length mix (12/4/2) and the displaced-pose
discrimination probe; commits the fine-tuned head weights as a flat
fp16 .npz so the trained-confidence demo survives machine restores.

No-Verification-Needed: artifact-only commit from the TPU job chain" \
        && stage "conf artifacts committed" || stage "conf commit failed"
fi
sleep 200

# 2. flagship (medium) accuracy gate — auto-resumes across retries
scripts/tpu_retry.sh /tmp/overfit_medium.log 18000 \
    python scripts/overfit_gate.py --model medium --steps 2500 \
    --ckpt_every 250 --eval_every 1250 \
    --out /root/repo/_overfit_medium \
    --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
stage "medium gate done ($?)"
if [ -f OVERFIT_GATE_MEDIUM.json ]; then
    git add -f OVERFIT_GATE_MEDIUM.json
    git commit -q -m "Flagship-config accuracy gate: medium-model closed loop

2500-step overfit of the medium (flagship) config on the 4 PoseBusters
demo systems, then the full guided redocking pipeline; records
top-ranked ligand RMSD per system (gate: < 2 A).

No-Verification-Needed: artifact-only commit from the TPU job chain" \
        && stage "medium gate committed" || stage "medium commit failed"
fi
sleep 200

# 3. no-crop blind-docking compile bill across two fresh processes
#    (VERDICT r2 item 10 done-condition: second process pays ~0 compile)
scripts/tpu_retry.sh /tmp/nocrop_p1.log 3600 python scripts/tpu_nocrop_dock.py
stage "nocrop p1 done ($?)"
sleep 200
scripts/tpu_retry.sh /tmp/nocrop_p2.log 3600 python scripts/tpu_nocrop_dock.py
stage "nocrop p2 done ($?)"
sleep 200

# 4. bench pass (load_detail attribution of the pass-leading stall)
scripts/tpu_retry.sh /tmp/bench_r3s5.log 3600 python bench.py
stage "bench done ($?)"
sleep 200

# 5. sampler-stage profiler (e2e-MFU vs kernel-MFU gap attribution)
scripts/tpu_retry.sh /tmp/sampler_prof.log 3600 \
    python scripts/tpu_sampler_profile.py
stage "sampler profile done ($?)"

stage "ALL DONE"
