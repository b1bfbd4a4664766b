#!/usr/bin/env bash
# Artifact export (reference results.sh): rebuild best config, load
# checkpoint, test, write the full data/ artifact set + results.png.
set -e
cd "$(dirname "$0")/.."
python -m contrastiveprosthetics_tpu.cli.results --no_adabn "$@"
