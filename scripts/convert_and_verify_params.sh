#!/usr/bin/env bash
# One-command released-weights pipeline (VERDICT r3): params.pt ->
# convert -> audit -> activation parity -> verified npz -> demo dock ->
# RMSD report.  Usage: convert_and_verify_params.sh PARAMS.pt [args...]
set -eu
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
exec python scripts/convert_and_verify_params.py "$@"
