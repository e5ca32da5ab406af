"""Per-query A/B timing harness for optimization work.

Runs the named golden queries N times each (noop sink, same session
shape as bench.py) and prints min/median per query — min-of-N in one
session is the only comparison that survives this shared VM's ±30%
scheduler noise. Optionally dumps .explain("formatted") to a file per
query (the plans/r14 evidence artifacts).

Usage:
    python tools/qtime.py [--n=5] [--sf=/root/testdata/sf0.1] \
        [--plans=plans/r14 --suffix=_before] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_on_aws_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    n, sf_dir, plans_dir, suffix = 5, "/root/testdata/sf0.1", None, ""
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--plans="):
            plans_dir = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        else:
            names.append(a)
    spark = get_spark(app_name="qtime")
    qs = entrymod.queries()
    unknown = [q for q in names if q not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def release_persisted() -> None:
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in jmap.values():
                jrdd.unpersist(False)
        except Exception:
            pass

    # engine-independent host gauge bracketing the run (bench.py's
    # probe): absolute numbers on this shared VM swing 2x within an
    # hour, so every qtime reading is reported with the probe that
    # accompanied it
    import bench as _bench

    probe_before = round(_bench.run_probe(spark), 3)

    # same warmup as bench.py: JVM/codegen + Python worker pool
    run(spark.range(0, 1_000_000).selectExpr("sum(id * 2) AS s"))
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    run(
        spark.range(0, 10_000, 1, spark.sparkContext.defaultParallelism)
        .select(_warm("id"))
    )

    for name in names:
        if plans_dir:
            import io
            from contextlib import redirect_stdout

            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for _ in range(n):
            release_persisted()
            spark.sparkContext.setJobDescription(f"qtime: {name}")
            t0 = time.perf_counter()
            run(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(samples):.3f} "
            f"median={statistics.median(samples):.3f} "
            f"all={[round(s, 3) for s in samples]}",
            flush=True,
        )
    print(
        f"probe: before={probe_before} "
        f"after={round(_bench.run_probe(spark), 3)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
