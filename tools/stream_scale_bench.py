"""Scaling curve for the STREAMING span-ledger ingest
(streaming/incremental.py::ingest_span_dedup_stream) — round-5 verdict
task: per-epoch cost must stay O(batch + ledger-scan), flat across
epochs, not growing with epoch count beyond the data actually added.

Method: for each delivery-volume factor K in {1, 3, 10}, deliver
EPOCHS consecutive disjoint batches of K x BASE documents from sf0.1
into a fresh corpus/ledger/checkpoint tree, timing each
``ingest_span_dedup_stream`` call (one availableNow pass per delivery).

What the numbers mean:

- ``epoch_growth`` = t(last epoch) / t(first epoch) at fixed K. The
  ledger the last epoch semi-joins against is (EPOCHS-1)x larger than
  the first epoch's, so a mild rise is the EXPECTED O(ledger-scan)
  cost; the red flag is growth tracking the CUMULATIVE corpus (a loop
  that re-excises old deliveries each epoch would show ~EPOCHS x).
- ``volume_ratio`` = total t(K) / total t(1). At these sizes ~1 s per
  epoch is fixed Structured-Streaming harness overhead (epoch
  planning, checkpoint commits), so ratios well below K mean
  overhead-dominated, and >> K means superlinear work.

Usage: python tools/stream_scale_bench.py [--json=SCALING_r05.json]
The output file MERGES into an existing SCALING json under the
"stream_span_ledger" key so batch and streaming curves live together.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_on_aws_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
ROOT = "scaledata/stream_scale"
BASE = 125  # docs per epoch at 1x; 4 epochs x 10x x 125 = the full 5000-doc table
EPOCHS = 4
FACTORS = (1, 3, 10)


def main() -> None:
    out_path = "SCALING_r05.json"
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]

    from pyspark.sql import types as T

    from batch_processing_on_aws_spark.streaming.incremental import (
        ingest_span_dedup_stream,
    )

    spark = get_spark(app_name="stream_scale_bench")
    con = duckdb.connect()
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    report: dict[str, dict] = {}
    for k in FACTORS:
        root = os.path.join(ROOT, f"x{k}")
        shutil.rmtree(root, ignore_errors=True)
        inp, corpus, ledger, ckpt = (
            os.path.join(root, d) for d in ("in", "corpus", "ledger", "ckpt")
        )
        os.makedirs(inp)
        batch = BASE * k
        epoch_times = []
        for e in range(EPOCHS):
            lo, hi = e * batch, (e + 1) * batch
            con.sql(
                f"COPY (SELECT doc_id, text FROM read_parquet('{SRC}') "
                f"WHERE doc_id >= {lo} AND doc_id < {hi}) TO "
                f"'{inp}/delivery_{e}.parquet' (FORMAT parquet)"
            )
            t0 = time.perf_counter()
            ingest_span_dedup_stream(spark, inp, schema, corpus, ledger, ckpt)
            epoch_times.append(round(time.perf_counter() - t0, 3))
            print(f"x{k:<3d} epoch {e}: {epoch_times[-1]:6.2f}s", flush=True)
        report[f"x{k}"] = {
            "docs_per_epoch": batch,
            "epoch_times_s": epoch_times,
            "total_s": round(sum(epoch_times), 3),
            "epoch_growth": round(epoch_times[-1] / epoch_times[0], 2),
        }

    for k in FACTORS[1:]:
        report[f"x{k}"]["volume_ratio"] = round(
            report[f"x{k}"]["total_s"] / report["x1"]["total_s"], 2
        )

    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    merged["stream_span_ledger"] = {
        "method": f"{EPOCHS} disjoint deliveries per factor, fresh "
                  "ledger tree, wall time per availableNow epoch "
                  "(tools/stream_scale_bench.py)",
        "factors": report,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps({k: v.get("epoch_growth") for k, v in report.items()}))


if __name__ == "__main__":
    main()
