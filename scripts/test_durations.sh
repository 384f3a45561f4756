#!/bin/sh
# Per-file test wall times (one fresh process per file: dodges the long-
# process persistent-cache flake documented in tests/conftest.py, and the
# per-file overhead is what a sharded run actually pays).  Used to choose
# @pytest.mark.slow marks (PARITY.md "Test-suite budget").
#
#   sh scripts/test_durations.sh [pytest-args...] > /tmp/test_durations.txt
out=/tmp/test_durations.txt
: > "$out"
for f in tests/test_*.py; do
    t0=$(date +%s.%N)
    python -m pytest "$f" -q -p no:cacheprovider "$@" >/tmp/last_test.log 2>&1
    rc=$?
    t1=$(date +%s.%N)
    printf '%8.1f  rc=%d  %s  %s\n' "$(echo "$t1 - $t0" | bc)" "$rc" "$f" \
        "$(tail -1 /tmp/last_test.log | tr -d '\n' | cut -c1-60)" | tee -a "$out"
done
sort -rn "$out" | head -15
