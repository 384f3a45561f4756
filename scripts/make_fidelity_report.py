#!/usr/bin/env python
"""Merge scripts/fidelity_{oracle,tpu}.json into FIDELITY.md."""

from __future__ import annotations

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    with open(os.path.join(HERE, "fidelity_oracle.json")) as fh:
        oracle = json.load(fh)
    with open(os.path.join(HERE, "fidelity_tpu.json")) as fh:
        tpu = json.load(fh)

    lines = [
        "# FIDELITY — float32 TPU (fused Pallas) vs float64 CPU oracle",
        "",
        "Every experiment family run end-to-end in both modes "
        "(`scripts/fidelity_matrix.py`); the oracle is this framework's jnp "
        "path in float64 on CPU — the reference-equivalent numerics "
        "(validated against finite differences and KKT conditions in "
        "`tests/`).  BASELINE.json's fidelity bar: learned parameters, "
        "PSNR/SSIM match to float32 tolerance.",
        "",
        "| Experiment | learned x (f64 oracle) | learned x (f32 TPU) | "
        "rel Δx | cost f64 | cost f32 | PSNR f64 | PSNR f32 | "
        "TPU speedup |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for key in oracle:
        o, t = oracle[key], tpu.get(key)
        if t is None:
            continue
        xo = np.asarray(o["x"], dtype=float).ravel()
        xt = np.asarray(t["x"], dtype=float).ravel()
        rel = float(np.linalg.norm(xo - xt)
                    / max(np.linalg.norm(xo), 1e-30))

        def fmt(x):
            if x.size == 1:
                return f"{x[0]:.6f}"
            return "[" + ", ".join(f"{v:.4g}" for v in x) + "]"

        lines.append(
            f"| {key} | {fmt(xo)} | {fmt(xt)} | {rel:.2e} "
            f"| {o['cost']:.4f} | {t['cost']:.4f} "
            f"| {o['mean_psnr']:.3f} | {t['mean_psnr']:.3f} "
            f"| {o['wall_s'] / max(t['wall_s'], 1e-9):.0f}× |")

    lines += [
        "",
        "Notes: parameter agreement is at float32 tolerance for all "
        "families except `sumregs_vec_circle`, whose three regularizers "
        "(forward/backward/centered gradients of the same image) are "
        "strongly correlated — the upper-level landscape has a nearly flat "
        "valley, and the float32 trajectory lands at a *different point "
        "with equal-or-lower cost and equal PSNR* (see cost/PSNR columns); "
        "this is landscape degeneracy, not numerical error.  Single-image "
        "experiments (patch2x2) see smaller TPU speedups because one 128² "
        "image underutilizes the chip and host↔device latency per "
        "trust-region iteration dominates.",
        "",
        f"Oracle total wall-clock: "
        f"{sum(o['wall_s'] for o in oracle.values()):.1f} s (CPU f64); "
        f"TPU total: {sum(t['wall_s'] for t in tpu.values()):.1f} s.",
    ]
    out = os.path.join(HERE, "..", "FIDELITY.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
