"""Outer-iteration logging.

Equivalent of ``AlgTools.LinkedLists`` + ``BilevelLogEntry``
(``src/BilevelVisualise.jl:39-46``) and ``write_log``
(called at ``src/BPLDenoising.jl:194``): an O(1)-append log of per-iteration
records serialized to the same whitespace-separated text format.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

__all__ = ["BilevelLogEntry", "IterLog", "write_log"]


@dataclass
class BilevelLogEntry:
    iter: int
    time: float       # seconds, excluding logging/visualization overhead
    function_value: float
    g_norm: float
    delta: float      # trust-region radius
    step_norm: float  # ‖x − x̄‖ of the last accepted step


class IterLog(List[BilevelLogEntry]):
    """Append-only log (plain list; the reference's linked list is an
    artifact of Julia-side immutability concerns)."""


def write_log(path: str, log: IterLog, header: str = "") -> None:
    with open(path, "w") as fh:
        if header:
            fh.write(header if header.endswith("\n") else header + "\n")
        fh.write("# iter\ttime\tfunction_value\tg_norm\tdelta\tstep_norm\n")
        for e in log:
            fh.write(f"{e.iter}\t{e.time:.6f}\t{e.function_value:.10e}\t"
                     f"{e.g_norm:.10e}\t{e.delta:.10e}\t{e.step_norm:.10e}\n")
