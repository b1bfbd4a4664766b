#!/usr/bin/env bash
# Full fused-training-chain A/B (VERDICT r3 next-round #1): both
# geometries, >=3 alternating trials per leg, ONE leg per process
# (the repo's cross-program contamination rule). Appends one JSON line
# per leg to $OUT. Run on an idle box — nothing else may share the host
# (CLAUDE.md: nproc=1, concurrent heavy processes stall axon dispatch).
set -u -o pipefail   # pipefail: run_leg's rc must see the python/timeout status through `| tail -1`
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/ab_fused_train_results.jsonl}
TRIALS=${TRIALS:-3}
: > "$OUT"

# A leg that times out / crashes / emits non-JSON must leave an explicit
# error record, not a silent hole in $OUT — an A/B summary computed over
# silently missing trials would be biased toward whichever leg survived.
run_leg() {  # geometry trial leg args...
  local geometry=$1 trial=$2 leg=$3; shift 3
  echo "== $geometry trial $trial leg $leg ==" >&2
  local line rc
  line=$(timeout 1800 python scripts/ab_fused_train.py --leg "$leg" "$@" \
         | tail -1); rc=$?
  if [ "$rc" -ne 0 ] || [ -z "$line" ] || [ "${line:0:1}" != "{" ]; then
    printf '{"geometry": "%s", "trial": %d, "leg": "%s", "error": "rc=%d, last_line=%s"}\n' \
      "$geometry" "$trial" "$leg" "$rc" \
      "$(printf '%s' "$line" | head -c 120 | tr -d '"\\')" >> "$OUT"
    return
  fi
  printf '%s\n' "$line" \
    | sed "s/^{/{\"geometry\": \"$geometry\", \"trial\": $trial, /" >> "$OUT"
}

for trial in $(seq 1 "$TRIALS"); do
  for leg in fused xla; do
    run_leg peak "$trial" "$leg" --batch_size 128 --compute_dtype bfloat16
  done
done
for trial in $(seq 1 "$TRIALS"); do
  for leg in fused xla; do
    run_leg canonical "$trial" "$leg" --batch_size 8 --compute_dtype float32
  done
done
cat "$OUT"
