#!/usr/bin/env bash
# Crop-dimension bisect for the 256/2048 training plateau (round 5).
# Toy model, 600 steps each, per-term logging:
#   C: crop 256 / atoms 1024  (token dim only)
#   D: crop 128 / atoms 2048  (atom dim only)
#   B: crop 128 / atoms 1024  (control — converged historically)
# Healthy = smooth_lddt descending + distogram << ln(39)=3.66 by ~step 400.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

probe() {  # name crop atoms
    scripts/tpu_retry.sh /tmp/probe_$1.log 3000 \
        python scripts/overfit_gate.py --model toy --steps 600 \
        --crop $2 --atom_crop $3 --aug 8 --ckpt_every 10000 \
        --dock_steps 8 --dock_rounds 1 --dock_poses 4 \
        --out /tmp/_probe_$1 --gate_out /tmp/probe_$1_gate.json
    echo "[probe $1 done rc=$?]" >> /tmp/r5.log
    sleep 200
}

probe C 256 1024
probe D 128 2048
probe B 128 1024
echo "[crop bisect ALL DONE]" >> /tmp/r5.log
