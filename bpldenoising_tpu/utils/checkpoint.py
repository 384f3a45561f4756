"""Checkpoint / resume for the outer bilevel loop.

The reference has no checkpointing (SURVEY.md §5: "Checkpoint/resume: none
for the learning loop") — this is a strictly-additive capability: an ``.npz``
snapshot of (x, Δ, BFGS model, log rows) per accepted outer iteration, cheap
enough to write every iteration, plus a loader to resume.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "CheckpointWriter"]


def save_checkpoint(path: str, *, x, delta: float, B=None, log_rows=None,
                    iteration: int = 0) -> None:
    tmp = path + ".tmp"   # np.savez appends ".npz" to this name
    np.savez(
        tmp,
        x=np.asarray(x),
        delta=np.asarray(delta),
        B=np.asarray(B) if B is not None else np.zeros(0),
        log=np.asarray(log_rows if log_rows is not None else np.zeros((0, 6))),
        iteration=np.asarray(iteration),
    )
    os.replace(tmp + ".npz", path)


def load_checkpoint(path: str) -> Optional[dict]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        out = {k: z[k] for k in z.files}
    if out.get("B") is not None and out["B"].size == 0:
        out["B"] = None
    return out


class CheckpointWriter:
    """Callback factory for :func:`bpldenoising_tpu.bilevel.bilevel_learn`."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def __call__(self, iteration, x, delta, log, B=None):
        rows = None
        if log:
            rows = np.asarray([
                [e.iter, e.time, e.function_value, e.g_norm, e.delta,
                 e.step_norm] for e in log])
        save_checkpoint(self.path, x=x, delta=delta, B=B, log_rows=rows,
                        iteration=iteration)
