#!/usr/bin/env bash
# Virtual-screening demo (equivalent of reference screening_demo.sh):
# dock the 8-SMILES demo library into the 6KZD pocket.
set -euo pipefail
DEMO=${DEMO:-$(dirname "$0")/../demo/screening}
OUT=${OUT:-./demo_out/screening}
PARAMS=${PARAMS:-}

python -m physdock_tpu.cli.screening \
    -i "$DEMO/6kzd.pkl.gz" -s "$DEMO/demo_db.txt" -o "$OUT" \
    ${PARAMS:+--params "$PARAMS"} \
    --msa_features_dir "$DEMO/features/msa_features" \
    --uniprot_msa_features_dir "$DEMO/features/uniprot_msa_features" \
    --max_samples 5 --num_samples_per_round 5 --max_rounds 2 \
    --crop_size 256 --atom_crop_size 2048 \
    --enable_physics_correction --use_pocket --enable_ranking
