#!/usr/bin/env bash
# Redocking demo (equivalent of reference redocking_demo.sh): prepare the
# demo system from receptor.pdb + EJQ.sdf, then dock with physics
# correction, pocket conditioning and ranking.
set -euo pipefail
DEMO=${DEMO:-/root/reference/demo/system_preparation}
OUT=${OUT:-./demo_out/redocking}
PARAMS=${PARAMS:-}   # path to params.pt or orbax ckpt; empty = random init smoke run

mkdir -p "$OUT/systems"
python -m physdock_tpu.cli.prepare_system \
    -r "$DEMO/receptor.pdb" -l "$DEMO/EJQ.sdf" -o "$OUT/systems"

python -m physdock_tpu.cli.redocking \
    -f "$OUT/systems" -o "$OUT/poses" \
    ${PARAMS:+--params "$PARAMS"} \
    --max_samples 40 --max_rounds 5 --num_samples_per_round 20 \
    --crop_size 256 --atom_crop_size 2048 \
    --enable_physics_correction --use_pocket --use_key_res --enable_ranking
