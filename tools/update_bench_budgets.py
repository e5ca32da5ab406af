"""Regenerate BENCH_BUDGETS.json from committed bench history.

Per-query budget = best (min) time across the last N committed
revisions of BENCH_QUERIES.json plus the current working-tree sidecar
— "best of recent rounds" is deliberately the floor, not the mean:
bench.py flags only confirmed exceedances of floor × tolerance, so a
noisy-host round can't ratchet budgets upward and mask a real
regression behind drift.

Run this when a plan change moves a query ON PURPOSE (the new time
becomes the floor once its sidecar is committed), never to make a red
`regressions` list green.

Usage: python tools/update_bench_budgets.py [--revs=3] [--tolerance=1.5]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n_revs, tol = 3, 1.5
    for a in sys.argv[1:]:
        if a.startswith("--revs="):
            n_revs = int(a.split("=", 1)[1])
        elif a.startswith("--tolerance="):
            tol = float(a.split("=", 1)[1])
    revs = subprocess.check_output(
        ["git", "-C", ROOT, "log", "--format=%h", f"-{n_revs}",
         "--", "BENCH_QUERIES.json"],
        text=True,
    ).split()
    best: dict[str, float] = {}
    probe_floor = float("inf")

    def _fold(d: dict) -> None:
        nonlocal probe_floor
        for q, t in d["queries"].items():
            best[q] = min(best.get(q, float("inf")), t)
        for t in (d.get("probe_secs") or {}).values():
            probe_floor = min(probe_floor, float(t))

    for rev in revs:
        _fold(json.loads(
            subprocess.check_output(
                ["git", "-C", ROOT, "show", f"{rev}:BENCH_QUERIES.json"]
            )
        ))
    cur_path = os.path.join(ROOT, "BENCH_QUERIES.json")
    if os.path.exists(cur_path):
        with open(cur_path) as f:
            _fold(json.load(f))
    # Deliberate floor overrides survive regeneration: when a plan
    # change moves a query ON PURPOSE (e.g. the round-6 star-cap added
    # a bucket-size agg to neardup_verified_pairs), min-of-history
    # would keep flagging the new cost forever. An override replaces
    # the floor and records why; remove it once history catches up.
    overrides: dict[str, dict] = {}
    drift_notes: dict[str, str] = {}
    bud_path = os.path.join(ROOT, "BENCH_BUDGETS.json")
    if os.path.exists(bud_path):
        with open(bud_path) as f:
            prior = json.load(f)
        overrides = prior.get("overrides", {})
        # adjudicated engine_drift_alarm post-mortems (bench.py) —
        # hand-written, preserved across regeneration like overrides
        drift_notes = prior.get("drift_notes", {})
    for q, o in overrides.items():
        best[q] = float(o["floor_sec"])
    out = {
        "method": f"per-query best across the last {n_revs} committed bench "
                  "sidecars + the working-tree sidecar (see bench.py "
                  "regression gate); refresh deliberately when a plan change "
                  "moves a query on purpose (tools/update_bench_budgets.py)",
        "tolerance_x": tol,
        "sf": 0.1,
        "overrides": overrides,
        "drift_notes": drift_notes,
        "budgets_sec": dict(sorted(best.items())),
    }
    # the engine-independent calibration probe's floor (bench.py
    # run_probe vs this = the host_factor the gate scales by); min of
    # the same history window as the per-query floors
    if probe_floor != float("inf"):
        out["probe_floor_sec"] = round(probe_floor, 3)
    with open(os.path.join(ROOT, "BENCH_BUDGETS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote BENCH_BUDGETS.json: {len(best)} queries from {revs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
