#!/usr/bin/env python
"""Sweep Mosaic schedule salts per kernel family and pin the fastest
binaries.

Mosaic draws a deterministic schedule per serialized-module hash; renaming
the Pallas kernels (``schedule_salt`` in ``solvers/pdps_pallas.py``)
perturbs the hash and produces a fresh draw that can be up to ~30% faster
or slower at bit-identical results.  Kernel families living in different
jitted modules draw INDEPENDENT lotteries, so one global salt cannot land
every module on its fastest schedule — each family gets its own salt:

- phase "flagship": global salt (``BPL_MOSAIC_SALT``) swept on
  ``bench.py --only flagship`` (the fused-TR module: pdps_warm + hg).
- phase "throughput": ``BPL_MOSAIC_SALT_PDPS_COLD`` swept on
  ``bench.py --only throughput`` (the standalone cold PDPS module —
  batch-256 throughput, pd rate, scaling ladder), global fixed.
- phase "one_kernel": ``BPL_MOSAIC_SALT_OK``/``_OK_TILED`` swept together
  on ``bench.py --only one_kernel`` (the single-loop learner kernels).

Each candidate compiles in its own cache dir; the winners' serialized
executables and a ``MOSAIC_SALTS.json`` mapping are installed into the
canonical cache dir used by ``bench.py`` and the CLI
(:func:`bpldenoising_tpu.utils.compile_cache.enable`).  Measurement goes
through bench.py itself so executables are traced at EXACTLY the call
sites the full bench uses — the persistent-cache key is
call-site-sensitive (even an identical computation traced from a
different file misses), so entries produced anywhere else would never be
reloaded by the driver's ``python bench.py`` run.

Run on the target TPU after ANY change to kernel source or bench.py (a
changed module hash means a fresh, unpinned draw):

    python scripts/pin_schedule.py                    # all three phases
    python scripts/pin_schedule.py --phases flagship  # just the headline
    python scripts/pin_schedule.py --salts ',r3a,r3b'
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PHASES = {
    # phase name -> (bench --only mode, env vars the candidate salt fills)
    "flagship": ("flagship", ("BPL_MOSAIC_SALT",)),
    "throughput": ("throughput", ("BPL_MOSAIC_SALT_PDPS_COLD",)),
    "one_kernel": ("one_kernel", ("BPL_MOSAIC_SALT_OK",
                                  "BPL_MOSAIC_SALT_OK_TILED")),
    # the map-weight and tiled TGV kernels are separate salt families
    # (own module hashes) but are swept in lockstep with the main TGV salt
    # — bench --only tgv compiles and exercises all three, and their
    # measured lottery spread is small (~4%), so a joint draw suffices
    "tgv": ("tgv", ("BPL_MOSAIC_SALT_TGV", "BPL_MOSAIC_SALT_TGV_MAP",
                    "BPL_MOSAIC_SALT_TGV_TILED", "BPL_MOSAIC_SALT_OK_TGV")),
    # vectorial (color) TV: the coupled 4-D-block kernel plus the
    # one-kernel-learner family swept in lockstep (both exercised by
    # --only vtv), scored on the batch-64 device throughput
    "vtv": ("vtv", ("BPL_MOSAIC_SALT_VTV", "BPL_MOSAIC_SALT_OK_VTV")),
    # TV-L1: the solver kernel plus the Huber-smoothed fused-TR kernel and
    # the one-kernel learner, swept in lockstep (all exercised by
    # --only tvl1), scored on the batch-64 device throughput
    "tvl1": ("tvl1", ("BPL_MOSAIC_SALT_TVL1", "BPL_MOSAIC_SALT_TVL1H",
                      "BPL_MOSAIC_SALT_OK_TVL1")),
}


_SEED = {"dir": None}


def _seed_cache(cand: str) -> set:
    """Pre-populate a fresh candidate cache dir with the entries of the
    last measured candidate.  The persistent cache is content-addressed
    (module hash in the key), so entries for OTHER salts simply miss while
    the non-swept modules — identical across candidates of a phase, and
    the bulk of each candidate's ~10 min compile bill on this 1-core box —
    hit.  Returns the set of seeded filenames so the installer can skip
    them (only entries the winning candidate itself compiled belong in the
    committed canonical cache)."""
    seeded: set = set()
    src = _SEED["dir"]
    if os.path.isdir(cand):
        return seeded
    os.makedirs(cand)
    if src and os.path.isdir(src):
        for f in os.listdir(src):
            if f.endswith("-cache"):
                shutil.copy2(os.path.join(src, f), os.path.join(cand, f))
                seeded.add(f)
    return seeded


def _measure(mode: str, env_salts: dict, cache_dir: str) -> dict:
    """Compile + measure one candidate through ``bench.py --only <mode>``.
    Lower ``value`` is better in every mode."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("BPL_MOSAIC_SALT")}
    env["BPL_COMPILE_CACHE"] = cache_dir
    env.update({k: v for k, v in env_salts.items() if v})
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--only", mode],
            capture_output=True, text=True, cwd=REPO, timeout=1800,
            env=env)
    except subprocess.TimeoutExpired:
        # a hung worker (stuck tunnel / compile service) must not kill the
        # sweep; note: killing a TPU client mid-run can leave the tunnel
        # slow for the NEXT process's first transfer
        print(f"{mode} {env_salts}: worker timed out (skipped)",
              file=sys.stderr)
        return {"best": float("inf")}
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        res = json.loads(line)
        return {"best": res["value"], "json": res}
    except (json.JSONDecodeError, KeyError, TypeError):
        print(f"{mode} {env_salts}: worker failed\n{out.stderr[-2000:]}",
              file=sys.stderr)
        return {"best": float("inf")}


def _sweep(phase: str, salts: list[str], fixed_env: dict, work: str,
           confirm_top: int) -> dict:
    mode, env_vars = PHASES[phase]
    results = []
    for i, salt in enumerate(salts):
        cand = os.path.join(work, f"{phase}_{i}")
        seeded = _seed_cache(cand)
        env_salts = dict(fixed_env)
        env_salts.update({v: salt for v in env_vars})
        res = _measure(mode, env_salts, cand)
        res.update(salt=salt, cache=cand, median=res["best"],
                   preseeded=seeded)
        if res["best"] != float("inf"):
            _SEED["dir"] = cand
        results.append(res)
        print(f"  {phase} salt={salt!r:8} value={res['best']:.4f}",
              file=sys.stderr)

    # re-confirm the top candidates in fresh processes (cache now warm, so
    # this measures the pinned binary free of its compile's process state)
    results.sort(key=lambda r: r["median"])
    for res in results[:confirm_top]:
        if res["best"] == float("inf"):
            continue
        env_salts = dict(fixed_env)
        env_salts.update({v: res["salt"] for v in env_vars})
        res2 = _measure(mode, env_salts, res["cache"])
        res["confirm"] = res2["best"]
        res["median"] = min(res["median"], res2["best"])
        print(f"  {phase} confirm salt={res['salt']!r:8} "
              f"value={res2['best']:.4f}", file=sys.stderr)

    results.sort(key=lambda r: r["median"])
    return results[0] | {"all": [
        {k: r[k] for k in ("salt", "best", "median", "confirm") if k in r}
        for r in results]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--salts", default=",r3a,r3b,r3c,r3d,r3e",
                    help="comma-separated candidate salts ('' = unsalted)")
    ap.add_argument("--phases", default="flagship,throughput,one_kernel")
    ap.add_argument("--confirm-top", type=int, default=2)
    ap.add_argument("--no-install", action="store_true")
    args = ap.parse_args()

    from bpldenoising_tpu.utils.compile_cache import default_cache_dir
    canonical = default_cache_dir()
    salts = list(args.salts.split(","))
    phases = [p.strip() for p in args.phases.split(",") if p.strip()]
    work = tempfile.mkdtemp(prefix="pin_schedule_")

    fixed_env: dict = {}
    # keep already-pinned families fixed while sweeping later phases
    salts_file = os.path.join(canonical, "MOSAIC_SALTS.json")
    if os.path.exists(salts_file):
        with open(salts_file) as fh:
            for key, salt in json.load(fh).items():
                var = (f"BPL_MOSAIC_SALT_{key.upper()}" if key
                       else "BPL_MOSAIC_SALT")
                fixed_env[var] = salt

    winners: dict[str, dict] = {}
    for phase in phases:
        if phase not in PHASES:
            raise SystemExit(f"unknown phase {phase!r}")
        win = _sweep(phase, salts, fixed_env, work, args.confirm_top)
        winners[phase] = win
        # later phases sweep with this phase's winner fixed
        for var in PHASES[phase][1]:
            fixed_env[var] = win["salt"]

    print(json.dumps({p: {"winner": w["salt"], "results": w["all"]}
                      for p, w in winners.items()}))

    if not args.no_install and any(
            w["best"] != float("inf") for w in winners.values()):
        os.makedirs(canonical, exist_ok=True)
        for w in winners.values():
            if w["best"] == float("inf"):
                continue
            for f in os.listdir(w["cache"]):
                if f.endswith("-cache") and f not in w.get("preseeded", ()):
                    shutil.copy2(os.path.join(w["cache"], f),
                                 os.path.join(canonical, f))
        salt_map = {}
        for var, salt in fixed_env.items():
            key = var[len("BPL_MOSAIC_SALT"):].lstrip("_")
            salt_map[key] = salt
        with open(salts_file, "w") as fh:
            json.dump(salt_map, fh, indent=1)
        # back-compat plain global-salt file
        with open(os.path.join(canonical, "MOSAIC_SALT"), "w") as fh:
            fh.write(salt_map.get("", "") + "\n")
        print(f"installed salts {salt_map} + executables into {canonical}",
              file=sys.stderr)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
