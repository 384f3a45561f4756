"""Profiling / tracing utilities.

The reference's "tracing" is wall-clock accounting inside the iteration
harness (SURVEY.md §5; ``src/BilevelVisualise.jl:60-62,201-209``), preserved
in :mod:`bpldenoising_tpu.bilevel.harness`.  This module adds the TPU-native
tier the reference lacks: XLA/TPU profiler traces (viewable in
TensorBoard/Perfetto) and a tiny section timer with ``block_until_ready``
semantics so device work is attributed to the right section.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

__all__ = ["trace", "SectionTimer"]


@contextlib.contextmanager
def trace(log_dir: str | None) -> Iterator[None]:
    """Wrap a region in a ``jax.profiler`` trace when ``log_dir`` is set
    (no-op otherwise)::

        with trace("/tmp/bpl_trace"):
            run_experiment()
    """
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class SectionTimer:
    """Accumulating named-section timer that forces device completion at
    section boundaries (``jax.block_until_ready``)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, result_holder=None):
        import jax
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result_holder is not None:
                jax.block_until_ready(result_holder)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name:30s} {self.totals[name]*1e3:10.2f} ms "
                         f"(n={self.counts[name]})")
        return "\n".join(lines)
