#!/usr/bin/env bash
# Redocking demo (equivalent of reference redocking_demo.sh): dock the four
# PoseBusters demo systems with their cached MSA features, with physics
# correction, pocket conditioning and ranking.  Ligand CCD chemistry is
# reconstructed from coordinates when the reference's CCD blob is absent
# (pass CCD_BLOB=... to use a real ccd_id_meta_data.pkl.gz).
set -euo pipefail
DEMO=${DEMO:-$(dirname "$0")/../demo/redocking}
PREP=${PREP:-$(dirname "$0")/../demo/system_preparation}
OUT=${OUT:-./demo_out/redocking}
PARAMS=${PARAMS:-}     # path to params.pt or orbax ckpt; empty = random init smoke run
CCD_BLOB=${CCD_BLOB:-}
MODEL=${MODEL:-medium}

# The 4 PoseBusters demo systems (reference demo assets)
python -m physdock_tpu.cli.redocking \
    -f "$DEMO/Posebusters_subset" -o "$OUT/posebusters" \
    --msa_features_dir "$DEMO/features/msa_features" \
    --uniprot_msa_features_dir "$DEMO/features/uniprot_msa_features" \
    ${PARAMS:+--params "$PARAMS"} \
    ${CCD_BLOB:+--ccd_blob "$CCD_BLOB"} \
    --model_name "$MODEL" \
    --max_samples 40 --max_rounds 5 --num_samples_per_round 20 \
    --crop_size 256 --atom_crop_size 2048 \
    --enable_physics_correction --use_pocket --use_key_res --enable_ranking

# System-preparation path: build a system from receptor.pdb + EJQ.sdf too
mkdir -p "$OUT/systems"
python -m physdock_tpu.cli.prepare_system \
    -r "$PREP/receptor.pdb" -l "$PREP/EJQ.sdf" -o "$OUT/systems"

python -m physdock_tpu.cli.redocking \
    -f "$OUT/systems" -o "$OUT/poses" \
    ${PARAMS:+--params "$PARAMS"} \
    --model_name "$MODEL" \
    --max_samples 40 --max_rounds 5 --num_samples_per_round 20 \
    --crop_size 256 --atom_crop_size 2048 \
    --enable_physics_correction --use_pocket --use_key_res --enable_ranking
