#!/usr/bin/env bash
# Probe G (round 5): 256/2048 with attn_impl=xla — rules the Pallas flash
# kernels in/out as the cause of the large-crop training plateau.  At the
# 2048-atom buckets (1792/1920 divisible by 128) the flash kernel is
# active during training; the healthy 1024-atom probe used it only at
# shapes the interpret tests cover.  If xla-only training learns
# (distogram << 3.66 and lddt descending by step ~300) the kernel is the
# bug; if it is still stuck, the cause is elsewhere.
# Waits for the crop-bisect chain to finish before touching the TPU.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

for i in $(seq 1 240); do
    grep -q "crop bisect ALL DONE" /tmp/r5.log 2>/dev/null && break
    sleep 60
done
grep -q "crop bisect ALL DONE" /tmp/r5.log || {
    echo "[probe G: bisect never finished]" >> /tmp/r5.log; exit 1; }

scripts/tpu_retry.sh /tmp/probe_G.log 3600 \
    python scripts/overfit_gate.py --model toy --steps 600 \
    --crop 256 --atom_crop 2048 --aug 8 --ckpt_every 10000 \
    --attn_impl xla \
    --dock_steps 8 --dock_rounds 1 --dock_poses 4 \
    --out /tmp/_probe_G --gate_out /tmp/probe_G_gate.json
echo "[probe G done rc=$?]" >> /tmp/r5.log
sleep 200
