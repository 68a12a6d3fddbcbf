#!/usr/bin/env bash
# Full docking demo (equivalent of reference docking_demo.sh): system prep
# -> homology search (needs hmmer/hhblits binaries + sequence DBs) ->
# physics-corrected redocking.
set -euo pipefail
DEMO=${DEMO:-$(dirname "$0")/../demo/system_preparation}
OUT=${OUT:-./demo_out/docking}
PARAMS=${PARAMS:-}
UNIREF90=${UNIREF90:-}      # path to uniref90 fasta db
BFD=${BFD:-}
UNICLUST30=${UNICLUST30:-}

mkdir -p "$OUT/systems"
python -m physdock_tpu.cli.prepare_system \
    -r "$DEMO/receptor.pdb" -l "$DEMO/EJQ.sdf" -o "$OUT/systems"

if [ -n "$UNIREF90" ]; then
    python -m physdock_tpu.cli.run_homo_search \
        -f "$OUT/systems" -o "$OUT/features" \
        --uniref90 "$UNIREF90" ${BFD:+--bfd "$BFD"} \
        ${UNICLUST30:+--uniclust30 "$UNICLUST30"}
    MSA_ARGS=(--msa_features_dir "$OUT/features/msa_features"
              --uniprot_msa_features_dir "$OUT/features/uniprot_msa_features")
else
    echo "[demo] no sequence DBs provided — single-sequence mode"
    MSA_ARGS=()
fi

python -m physdock_tpu.cli.redocking \
    -f "$OUT/systems" -o "$OUT/poses" \
    ${PARAMS:+--params "$PARAMS"} "${MSA_ARGS[@]}" \
    --max_samples 40 --max_rounds 5 --num_samples_per_round 20 \
    --crop_size 256 --atom_crop_size 2048 \
    --enable_physics_correction --use_pocket --use_key_res --enable_ranking
