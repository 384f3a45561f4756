"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY.md §4), and with x64 enabled so
float64 oracles (finite differences, dense solves) are available.
"""

import os

# Must be set before jax initializes a backend.  Force CPU (the ambient
# environment may point JAX_PLATFORMS at a tunneled TPU, which is pathological
# for many tiny test ops and unavailable in CI).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The ambient 'axon' TPU plugin overrides the JAX_PLATFORMS env var; the
# config API takes precedence — force the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# XLA:CPU compiles are slow in this environment (~0.5s per tiny executable);
# cache them persistently so repeat test runs are cheap.  The cache dir is
# keyed by a HOST CPU fingerprint: XLA:CPU AOT executables encode the
# compile machine's feature set (avx512/amx/...), and deserializing an
# entry produced on a different host can hard-crash the process
# (observed: SIGSEGV in compilation_cache.get_executable_and_time loading
# +prefer-no-scatter entries from an amx-capable builder on a plainer
# host) — a per-host subdir makes foreign entries unreachable.


def _host_fingerprint() -> str:
    import hashlib
    import platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = line.strip()
                    break
    except OSError:
        pass
    blob = f"{platform.machine()}|{flags}"
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                          _host_fingerprint())
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
# Cache only compiles that actually cost something: caching every tiny
# executable produced ~2k entries per full run, and the cache get/put path
# has been observed to segfault sporadically in very long processes —
# fewer entries keeps most of the win at a fraction of the traffic.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import json  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --- test-suite budget (PARITY.md "Test-suite budget") -------------------
# tests/durations.json records each test's measured 'call' seconds on the
# reference dev box (warm compile cache; refresh recipe in
# scripts/make_durations_manifest.py).  Every test at or above the
# manifest's slow_threshold_s is auto-marked @pytest.mark.slow here, so
#     pytest -m "not slow"        # quick developer run (~3 min, 1 core)
#     pytest                      # full suite (the CI / pre-commit gate)
# Tests absent from the manifest (new tests) default to quick until the
# manifest is refreshed.  Explicit @pytest.mark.slow marks still work.

def _load_durations():
    path = os.path.join(os.path.dirname(__file__), "durations.json")
    try:
        with open(path) as fh:
            payload = json.load(fh)
        return float(payload["slow_threshold_s"]), payload["durations"]
    except (OSError, KeyError, ValueError):
        return 5.0, {}


_SLOW_THRESHOLD_S, _DURATIONS = _load_durations()


def pytest_deselected(items):
    """Record deselected items so tests/test_doc_counts.py can reconstruct
    the TOTAL collected count under ``-m "not slow"`` runs."""
    if items:
        config = items[0].config
        store = getattr(config, "_bpl_deselected_items", None)
        if store is None:
            store = config._bpl_deselected_items = []
        store.extend(items)


def pytest_collection_modifyitems(config, items):
    for item in items:
        # manifest keys are repo-root-relative ("tests/test_x.py::..."); the
        # nodeid drops the "tests/" prefix when pytest is invoked from
        # inside tests/, so try both spellings
        secs = _DURATIONS.get(item.nodeid) or _DURATIONS.get(
            "tests/" + item.nodeid, 0.0)
        if secs >= _SLOW_THRESHOLD_S:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
