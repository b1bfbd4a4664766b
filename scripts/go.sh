#!/usr/bin/env bash
# Canonical experiment (reference go.sh:5): 150-config crossval (cached),
# 8-epoch annealed final train, voted test, no AdaBN.
set -e
cd "$(dirname "$0")/.."
python -m contrastiveprosthetics_tpu.cli.train \
  --final_epochs=8 --crossval_size=150 --batch_size=8 \
  --crossval_load --test --no_adabn "$@"
