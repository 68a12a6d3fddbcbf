#!/usr/bin/env bash
# Round-5 finisher chain. Waits for the r5b chain to fully drain, then
# spends the remaining TPU window polishing the flagship medium gate:
# stage-1 of r5b was deadline-cut at step 2790/4500 with loss still
# descending (3-7, oscillating on weighted_mse) and the dock showing
# every system has sub-2A poses in top-5 but majority mass on a wrong
# basin for 3/4 systems.  Resume the SAME run (auto-resume from the
# orbax ckpt in _overfit_medium256/ckpts) at a lower polish LR so the
# pose distribution concentrates, then re-dock the full gate.
#
# One TPU process at a time; tpu_retry handles tunnel drops; everything
# commits immediately; hard wall-clock end leaves the chip idle for the
# driver's end-of-round bench.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

HARD_END=${HARD_END:-$(( $(date +%s) + 14100 ))}   # default ~3h55m from launch
stage() { echo "[r5c $(date +%H:%M:%S) +$(( $(date +%s)-T0 ))s] $*" >> /tmp/r5c.log; }
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

# ---------- wait for the r5b chain (and any TPU process it owns) ----------
T0=$(date +%s)
stage "waiting for r5b chain (HARD_END=$HARD_END)"
while [ ! -f /tmp/r5b_chain_done ]; do
    if ! kill -0 "$(cat /tmp/r5b.pid 2>/dev/null)" 2>/dev/null; then
        stage "r5b pid gone without done-flag; assuming chain dead"
        break
    fi
    sleep 60
done
stage "r5b drained; cooldown"
sleep 220   # TPU cooldown after the last r5b process

# ---------- stage 1: resume medium 256/2048 at polish LR + re-dock ----------
NOW=$(date +%s)
T0=$NOW
D1=$(( HARD_END - 1700 ))          # leave room for the dock phase + npz
if [ $(( D1 - NOW )) -gt 900 ]; then
    scripts/tpu_retry.sh /tmp/overfit_medium256c.log $(( HARD_END - NOW + 600 )) \
        python scripts/overfit_gate.py --model medium --steps 12000 \
        --crop 256 --atom_crop 2048 --lr 3e-4 \
        --ckpt_every 250 --deadline_ts $D1 \
        --out /root/repo/_overfit_medium256 \
        --gate_out /root/repo/OVERFIT_GATE_MEDIUM.json
    stage "stage1 medium-256 polish resume done (rc=$?)"
    commit_if "Medium 256/2048 gate: extended polish window at lr 3e-4

Stage-1 of the r5b chain was deadline-cut at step 2790/4500 with the
loss still descending; every system already had sub-2A poses in top-5
but 3/4 kept majority mass on a wrong basin.  Resume the same run at a
lower LR to concentrate the pose distribution, then re-run the full
guided redocking gate." \
        OVERFIT_GATE_MEDIUM.json _overfit_medium256/ema_params.npz
    sleep 220
else
    stage "stage1 SKIPPED (no window left)"
fi

# ---------- stage 2: anything r5b skipped ----------
NOW=$(date +%s)
if grep -q "stage4 bf16" /tmp/r5b.log 2>/dev/null; then :; else
    if [ $NOW -lt $(( HARD_END - 1200 )) ] && [ -f _overfit_medium256/ema_params.npz ]; then
        scripts/tpu_retry.sh /tmp/bf16_drift.log 1500 \
            python scripts/bf16_drift_tpu.py /root/repo/_overfit_medium256/ema_params.npz \
            --model medium --crop 256 --atom_crop 2048
        stage "stage2 bf16 drift (skipped in r5b) done (rc=$?)"
        commit_if "bf16-carry drift measured at medium scale" BF16_DRIFT.json
        sleep 220
    fi
fi
NOW=$(date +%s)
if grep -q "stage5 sampler profile" /tmp/r5b.log 2>/dev/null; then :; else
    if [ $NOW -lt $(( HARD_END - 1500 )) ]; then
        scripts/tpu_retry.sh /tmp/stage_profile.log 1800 \
            python scripts/tpu_sampler_profile.py
        stage "stage2 sampler profile (skipped in r5b) done (rc=$?)"
        commit_if "Per-stage sampler profile re-run with honest fori_loop timing" \
            STAGE_PROFILE.json
        sleep 220
    fi
fi

# ---------- stage 3: bench smoke so perf changes land measured ----------
NOW=$(date +%s)
if [ $NOW -lt $(( HARD_END - 900 )) ]; then
    timeout 900 python bench.py > /tmp/bench_smoke.json 2>/tmp/bench_smoke.log
    stage "stage3 bench smoke done (rc=$?): $(tail -c 400 /tmp/bench_smoke.json 2>/dev/null)"
fi

stage "chain ALL DONE (chip idle from here)"
touch /tmp/r5c_chain_done
