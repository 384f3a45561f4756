"""Outer-iteration logging.

Equivalent of ``AlgTools.LinkedLists`` + ``BilevelLogEntry``
(``src/BilevelVisualise.jl:39-46``) and ``write_log``
(called at ``src/BPLDenoising.jl:194``): an O(1)-append log of per-iteration
records serialized to the same whitespace-separated text format.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List

__all__ = ["BilevelLogEntry", "IterLog", "write_log"]

_NAN = float("nan")


@dataclass
class BilevelLogEntry:
    iter: int
    time: float       # seconds, excluding logging/visualization overhead
    function_value: float
    g_norm: float
    delta: float      # trust-region radius
    step_norm: float  # ‖x − x̄‖ of the last accepted step
    # adjoint-CG telemetry (utils/telemetry.py); NaN = not recorded, which
    # keeps the serialized format identical to the reference's 6 columns
    # for paths that predate/bypass the telemetry
    adjoint_cg_iters: float = _NAN
    adjoint_cg_converged: float = _NAN   # 1.0 / 0.0


class IterLog(List[BilevelLogEntry]):
    """Append-only log (plain list; the reference's linked list is an
    artifact of Julia-side immutability concerns)."""


def write_log(path: str, log: IterLog, header: str = "") -> None:
    with_cg = any(not math.isnan(e.adjoint_cg_iters) for e in log)
    with open(path, "w") as fh:
        if header:
            fh.write(header if header.endswith("\n") else header + "\n")
        cols = "# iter\ttime\tfunction_value\tg_norm\tdelta\tstep_norm"
        if with_cg:
            cols += "\tadjoint_cg_iters\tadjoint_cg_converged"
        fh.write(cols + "\n")
        for e in log:
            row = (f"{e.iter}\t{e.time:.6f}\t{e.function_value:.10e}\t"
                   f"{e.g_norm:.10e}\t{e.delta:.10e}\t{e.step_norm:.10e}")
            if with_cg:
                row += (f"\t{e.adjoint_cg_iters:.0f}"
                        f"\t{e.adjoint_cg_converged:.0f}")
            fh.write(row + "\n")
