#!/usr/bin/env python
"""Turn a `pytest --durations=0` log into tests/durations.json.

The manifest maps test nodeid -> measured 'call' seconds on the reference
dev box (1 CPU core, warm persistent compile cache).  tests/conftest.py
reads it at collection time and auto-marks every test at or above the
slow threshold with @pytest.mark.slow, so `pytest -m "not slow"` is a
budgeted quick run (PARITY.md "Test-suite budget").

Refresh recipe:
    sh scripts/test_durations.sh            # per-file sweep, warm cache
    python scripts/make_durations_manifest.py /tmp/test_durations_all.log
"""

import json
import re
import sys
from pathlib import Path

LINE = re.compile(r"^\s*(\d+(?:\.\d+)?)s\s+call\s+(tests/\S+)")


def main(argv):
    src = Path(argv[1]) if len(argv) > 1 else Path("/tmp/test_durations_all.log")
    out = Path(__file__).resolve().parent.parent / "tests" / "durations.json"
    durations = {}
    for line in src.read_text().splitlines():
        m = LINE.match(line)
        if m:
            secs, nodeid = float(m.group(1)), m.group(2)
            # keep the max across repeated runs in the same log
            durations[nodeid] = max(secs, durations.get(nodeid, 0.0))
    if not durations:
        sys.exit(f"no duration lines found in {src}")
    payload = {
        "_comment": "measured 'call' seconds, warm cache, 1-core dev box; "
                    "see scripts/make_durations_manifest.py for the refresh "
                    "recipe.  conftest.py auto-marks >= slow_threshold_s "
                    "as @pytest.mark.slow.",
        "slow_threshold_s": 1.0,
        "durations": dict(sorted(durations.items(),
                                 key=lambda kv: -kv[1])),
    }
    out.write_text(json.dumps(payload, indent=1) + "\n")
    n_slow = sum(1 for v in durations.values()
                 if v >= payload["slow_threshold_s"])
    total = sum(durations.values())
    slow = sum(v for v in durations.values()
               if v >= payload["slow_threshold_s"])
    print(f"{out}: {len(durations)} tests, {total:.0f}s total call time; "
          f"{n_slow} marked slow ({slow:.0f}s) -> quick run ~{total - slow:.0f}s")


if __name__ == "__main__":
    main(sys.argv)
