#!/bin/sh
# Per-file test wall times + per-test durations (one fresh process per
# file: dodges the long-process persistent-cache flake documented in
# tests/conftest.py, and the per-file overhead is what a sharded run
# actually pays).  Feeds tests/durations.json via
# scripts/make_durations_manifest.py, which drives the automatic
# @pytest.mark.slow marking (PARITY.md "Test-suite budget").
#
#   sh scripts/test_durations.sh [pytest-args...]
#   python scripts/make_durations_manifest.py /tmp/test_durations_all.log
out=/tmp/test_durations.txt
dur=/tmp/test_durations_all.log
: > "$out"
: > "$dur"
for f in tests/test_*.py; do
    t0=$(date +%s.%N)
    python -m pytest "$f" -q -p no:cacheprovider --durations=0 \
        "$@" >/tmp/last_test.log 2>&1
    rc=$?
    t1=$(date +%s.%N)
    cat /tmp/last_test.log >> "$dur"
    printf '%8.1f  rc=%d  %s  %s\n' \
        "$(awk "BEGIN{print $t1 - $t0}")" "$rc" "$f" \
        "$(tail -1 /tmp/last_test.log | tr -d '\n' | cut -c1-60)" | tee -a "$out"
done
sort -rn "$out" | head -15
