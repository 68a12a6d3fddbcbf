#!/usr/bin/env bash
# Fully self-contained demo: synthesize a receptor+ligand complex from
# nothing (no reference assets, no downloads), then run the guided
# redocking pipeline on it.  Weights are random init unless PARAMS is set;
# the point is the end-to-end plumbing.  PLATFORM=tpu to run on-device
# (default cpu so the demo never contends for the chip).
set -eu
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/physdock_demo}
MODEL=${MODEL:-toy}
PLATFORM=${PLATFORM:-cpu}
PARAMS=${PARAMS:-}

python scripts/make_demo_system.py --output_dir "$OUT"
OUT="$OUT" MODEL="$MODEL" PLATFORM="$PLATFORM" PARAMS="$PARAMS" python - <<'EOF'
import os

import jax

if os.environ["PLATFORM"] != "tpu":
    jax.config.update("jax_platforms", os.environ["PLATFORM"])

from physdock_tpu.cli.redocking import main

out = os.environ["OUT"]
argv = [
    "-i", f"{out}/DEMO_A_B_1.pkl.gz",
    "-o", f"{out}/redock",
    "--model_name", os.environ["MODEL"],
    "--crop_size", "64", "--atom_crop_size", "256",
    "--max_samples", "4", "--num_samples_per_round", "4",
    "--max_rounds", "1", "--steps", "10",
    "--enable_physics_correction", "--enable_ranking",
]
if os.environ["PARAMS"]:
    argv += ["--params", os.environ["PARAMS"]]
main(argv)
EOF
echo "outputs in $OUT/redock"
