#!/usr/bin/env bash
# Fetch the preprocessed benchmark systems (PoseBusters, DeepDockingDare,
# PhiBench; zenodo 15178859 — reference scripts/download_benchmarks.sh).
set -euo pipefail
DEST=${1:-benchmarks}
mkdir -p "$DEST"
wget -O "$DEST/physdock_benchmarks.zip" \
    "https://zenodo.org/records/15178859/files/physdock_benchmarks.zip?download=1"
unzip -o "$DEST/physdock_benchmarks.zip" -d "$DEST"
