#!/usr/bin/env bash
# Fetch the released PhysDock checkpoints (zenodo 15178859; reference
# scripts/download_params.sh).  params.pt (latest EMA) converts directly via
# physdock_tpu.model.import_weights.import_checkpoint.
set -euo pipefail
DEST=${1:-params}
mkdir -p "$DEST"
BASE="https://zenodo.org/records/15178859/files"
for f in params.pt params_2418.pt; do
    [ -f "$DEST/$f" ] || wget -O "$DEST/$f" "$BASE/$f?download=1"
done
echo "checkpoints in $DEST/"
