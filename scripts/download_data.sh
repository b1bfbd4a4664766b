#!/usr/bin/env bash
# Fetch the Ninapro DB2/DB3 corpus (Dryad doi:10.5061/dryad.1k84r) and lay it
# out as db2/s1..40 and db3/s1..11 — the tree the ingest CLI reads
# (reference download_data.sh:4-39, minus its sudo/chmod/emg.pt vestiges).
#
# Usage: scripts/download_data.sh [TARGET_DIR]
#   TARGET_DIR defaults to ./ninapro. Resumable: the dataset zip download
#   uses wget -c, and already-unpacked subjects are skipped.
#
# Afterwards:
#   cptpu-load --load --load_glove --root TARGET_DIR --data_dir data
#   scripts/go.sh --data_dir data
set -euo pipefail

TARGET="${1:-ninapro}"
DRYAD_URL="http://datadryad.org/api/v2/datasets/doi%253A10.5061%252Fdryad.1k84r/download"

mkdir -p "$TARGET"
cd "$TARGET"

if [ ! -f data_db23.zip ]; then
    echo "downloading Ninapro DB2+DB3 from Dryad (tens of GB)..."
    wget -c -O data_db23.zip.part "$DRYAD_URL"
    mv data_db23.zip.part data_db23.zip
fi

if [ ! -d txt ]; then
    unzip -n data_db23.zip
    mkdir -p txt
    mv -f ./*.txt txt/ 2>/dev/null || true
fi

unpack_subject() {
    local db="$1" i="$2" zipname="$3"
    local dir="$db/s$i"
    if compgen -G "$dir/*_A1.mat" >/dev/null; then
        return 0  # already unpacked
    fi
    mkdir -p "$dir"
    [ -f "$zipname" ] && mv -f "$zipname" "$dir/"
    if compgen -G "$dir/*.zip" >/dev/null; then
        (cd "$dir" && unzip -n ./*.zip)
    else
        echo "WARNING: no archive for $dir" >&2
    fi
}

for i in $(seq 1 40); do
    unpack_subject db2 "$i" "DB2_s$i.zip"
done

echo "amputees"
for i in $(seq 1 11); do
    unpack_subject db3 "$i" "DB3_s$i.zip"
done

echo "verifying layout..."
missing=0
for i in $(seq 1 40); do
    compgen -G "db2/s$i/S${i}_E1_A1*.mat" >/dev/null || { echo "missing db2/s$i" >&2; missing=1; }
done
for i in $(seq 1 11); do
    compgen -G "db3/s$i/S${i}_E1_A1*.mat" >/dev/null || { echo "missing db3/s$i" >&2; missing=1; }
done
if [ "$missing" -eq 0 ]; then
    echo "OK: db2/s1..40 and db3/s1..11 ready under $PWD"
    echo "next: cptpu-load --load --load_glove --root $PWD --data_dir data"
else
    echo "some subjects missing — re-run to resume" >&2
    exit 1
fi
