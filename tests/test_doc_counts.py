"""Documented test counts must match the live collection (VERDICT r4 #5).

Three rounds in a row the hand-written counts in README.md / PARITY.md
drifted from reality (462→466 in r3, 516→520 / 390→394 in r4).  This test
ends the pattern: every ``"N tests"`` claim in the two documents must equal
either the TOTAL collected count or the QUICK-tier count (total minus
slow-marked) of the very pytest session running this test, so the numbers
physically cannot drift without the suite going red.

The quick-tier count is manifest-derived: ``tests/conftest.py`` auto-marks
tests at/above ``slow_threshold_s`` from ``tests/durations.json``, so the
comparison also guards the "quick-tier count matches the manifest" claim.

Counts are computed from ``session.items`` plus the items pytest deselected
(recorded by the ``pytest_deselected`` hook in conftest), so the assertion
holds identically under ``pytest`` and ``pytest -m "not slow"``.  Filtered
invocations (``-k``, exotic ``-m``, single-file runs) skip — their
collection is not the documented suite.
"""

import re
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
DOCS = ("README.md", "PARITY.md")

# claims look like "520 tests", "394 tests in ~3 min"; 3-4 digits so prose
# like "2 tests" or years never match
CLAIM_RE = re.compile(r"\b(\d{3,4})\s+tests\b")


def test_documented_counts_match_collection(request):
    config = request.config
    if config.getoption("-k"):
        pytest.skip("-k filtered run: collection is not the full suite")
    mexpr = config.getoption("-m") or ""
    if mexpr not in ("", "not slow"):
        pytest.skip(f"-m {mexpr!r} run: collection is not a documented tier")
    session = request.session
    deselected = getattr(config, "_bpl_deselected_items", [])
    all_items = list(session.items) + list(deselected)
    if not any("test_doc_counts" not in it.nodeid.split("::")[0]
               for it in all_items) or len({it.nodeid.split("::")[0]
                                            for it in all_items}) < 10:
        pytest.skip("partial collection (single-file run)")

    total = len(all_items)
    n_slow = sum(1 for it in all_items
                 if it.get_closest_marker("slow") is not None)
    quick = total - n_slow
    valid = {total, quick}

    failures = []
    for doc in DOCS:
        text = (ROOT / doc).read_text()
        for m in CLAIM_RE.finditer(text):
            n = int(m.group(1))
            if n not in valid:
                line = text[: m.start()].count("\n") + 1
                failures.append(f"{doc}:{line} claims {n} tests; live "
                                f"counts are total={total} quick={quick}")
    assert not failures, "\n".join(failures)
