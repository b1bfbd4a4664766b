#!/usr/bin/env bash
# Full fused-training-chain A/B (VERDICT r3 next-round #1): both
# geometries, >=3 alternating trials per leg, ONE leg per process
# (the repo's cross-program contamination rule). Appends one JSON line
# per leg to $OUT. Run on an idle box — nothing else may share the host
# (CLAUDE.md: nproc=1, concurrent heavy processes stall axon dispatch).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/ab_fused_train_results.jsonl}
TRIALS=${TRIALS:-3}
: > "$OUT"
for trial in $(seq 1 "$TRIALS"); do
  for leg in fused xla; do
    echo "== peak trial $trial leg $leg ==" >&2
    timeout 1800 python scripts/ab_fused_train.py --leg "$leg" \
      --batch_size 128 --compute_dtype bfloat16 \
      | tail -1 | sed "s/^{/{\"geometry\": \"peak\", \"trial\": $trial, /" \
      >> "$OUT"
  done
done
for trial in $(seq 1 "$TRIALS"); do
  for leg in fused xla; do
    echo "== canonical trial $trial leg $leg ==" >&2
    timeout 1800 python scripts/ab_fused_train.py --leg "$leg" \
      --batch_size 8 --compute_dtype float32 \
      | tail -1 | sed "s/^{/{\"geometry\": \"canonical\", \"trial\": $trial, /" \
      >> "$OUT"
  done
done
cat "$OUT"
