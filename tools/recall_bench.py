"""Recall-at-scale evidence for the ANN family (round-5 verdict task
5): SCALING_r05 measured the approximate top-k queries' RUNTIME at
1x/3x/10x data but not their RESULT QUALITY — a banding scheme can
stay fast while its recall collapses as buckets dilute. This tool
records recall@k of each approximate path against the brute-force
cosine top-k on the SAME data at 1x (sf0.1) and 10x (tools/
gen_scale.py clone), promoting the dev-scale recall tests
(tests/test_neardup_similarity.py) to measured scale evidence.

recall@k = |ANN top-k ∩ exact top-k| / k, averaged over the 5 query
vectors the registry queries use (vec_id < 5). Ties at the k-th score
are broken identically (cos_sim desc, vec_id asc) in every path, so
the intersection is well-defined.

Usage: python tools/recall_bench.py [--json=RECALL_r06.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_on_aws_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SCALES = {
    "1x": "/root/testdata/sf0.1",
    "10x": "scaledata/x10",
    "30x": "scaledata/x30",
}
EXACT = "embedding_topk"
APPROX = [
    "embedding_lsh_topk",
    "embedding_multilsh_topk",
    "embedding_ivf_topk",
    # the STANDING index (train-once on delivery 1, add delivery 2
    # against frozen centroids): same probe settings as
    # embedding_ivf_topk, so the recall delta isolates what freezing
    # the quantizer on half the corpus costs
    "incremental_ivf_topk",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
]
K = 10


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():  # ≤ 5 queries × k rows
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _timed(mk) -> tuple[dict[int, set[int]], float]:
    """min-of-2 timing, same discipline as the skew/scale benches: a
    single-run number on a shared VM folds scheduler/GC/JIT noise into
    the measurement — the round-7 sidecar's 1x brute-force baseline
    (6.9 s vs 1.05 s at 10x) was exactly that warm-up contamination."""
    best, result = float("inf"), None
    for _ in range(2):
        t0 = time.perf_counter()
        result = _topk_sets(mk())
        best = min(best, time.perf_counter() - t0)
    return result, round(best, 2)


def main() -> None:
    out_path = "RECALL_r06.json"
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    spark = get_spark(app_name="recall_bench")
    qs = entrymod.queries()
    # Warm the JVM/codegen AND the Python/Arrow worker pool before any
    # timed run (the PQ paths fork per-core pandas workers on first
    # use) — otherwise the first-measured query absorbs the whole
    # session's startup cost.
    first_dir = next(
        (d for d in SCALES.values()
         if os.path.exists(os.path.join(d, "embeddings.parquet"))),
        None,
    )
    if first_dir:
        _topk_sets(qs[EXACT](spark, first_dir))
        _topk_sets(qs["embedding_pq_topk"](spark, first_dir))
    report: dict[str, dict] = {}
    for scale, sf_dir in SCALES.items():
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            print(f"skip {scale}: {sf_dir} missing (run tools/gen_scale.py)")
            continue
        exact, exact_secs = _timed(lambda: qs[EXACT](spark, sf_dir))
        report[scale] = {"brute_force_secs": exact_secs, "recall_at_k": {}}
        for name in APPROX:
            approx, secs = _timed(lambda: qs[name](spark, sf_dir))
            recalls = [
                len(approx.get(q, set()) & hits) / max(len(hits), 1)
                for q, hits in sorted(exact.items())
            ]
            report[scale]["recall_at_k"][name] = {
                "mean": round(sum(recalls) / len(recalls), 3),
                "min": round(min(recalls), 3),
                "per_query": [round(x, 3) for x in recalls],
                "secs": secs,
            }
            print(
                f"{scale:4s} {name:26s} recall@{K} "
                f"mean={sum(recalls)/len(recalls):.3f} "
                f"min={min(recalls):.3f} ({secs}s; brute {exact_secs}s)",
                flush=True,
            )
    # Frontier variants (not registry queries): the registry DEFAULTS
    # are now the high-recall operating points promoted by the round-6
    # verdict (multi-probe LSH, 12 IVF probes, PQ/IVF-PQ with exact
    # re-rank of the ADC shortlist). The fixture's true neighbors are
    # WEAK (max cosine ≈ 0.40 on near-isotropic vectors) — the worst
    # case for partition-based ANN, so high recall costs a large
    # candidate fraction. These variants document the CHEAP end of the
    # frontier (the r6 defaults) so the recall-vs-candidate-volume
    # trade stays measured in both directions; at 100 TB you pick the
    # operating point from a table like this one.
    from pyspark.sql import functions as F  # noqa: E402

    from batch_processing_on_aws_spark.operators.similarity import (  # noqa: E402
        ivf_topk,
        lsh_topk,
        pq_topk,
    )
    from batch_processing_on_aws_spark.plans.golden import (  # noqa: E402
        _deterministic_planes,
    )
    from batch_processing_on_aws_spark.sources.readers import (  # noqa: E402
        load_table,
    )

    for scale, sf_dir in SCALES.items():
        if scale not in report:
            continue
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = _topk_sets(qs[EXACT](spark, sf_dir))

        tuned = {
            # r6 registry defaults — the cheap/low-recall frontier end
            "lsh_8p_home_only": lambda: lsh_topk(
                emb, queries, _deterministic_planes(8, 64), k=K
            ),
            "ivf_probe3": lambda: ivf_topk(
                emb, queries, n_cells=16, n_probe=3, k=K
            ),
            "pq_m8_norefine": lambda: pq_topk(
                emb, queries, m=8, k_codes=16, k=K, refine=None
            ),
        }
        report[scale]["frontier_variants"] = {}
        for name, mk in tuned.items():
            approx, secs = _timed(mk)
            recalls = [
                len(approx.get(q, set()) & hits) / max(len(hits), 1)
                for q, hits in sorted(exact.items())
            ]
            report[scale]["frontier_variants"][name] = {
                "mean": round(sum(recalls) / len(recalls), 3),
                "min": round(min(recalls), 3),
                "secs": secs,
            }
            print(
                f"{scale:4s} tuned:{name:21s} recall@{K} "
                f"mean={sum(recalls)/len(recalls):.3f} ({secs}s)",
                flush=True,
            )
    # Post-delete recall (round 12): IVFIndex.delete removes ~1/7 of
    # the vectors from the standing index; recall of the survivor
    # probe must be measured against brute force over the SAME
    # survivor set (the full-corpus baseline would count deleted
    # vectors as misses and understate it). The quantizer stays the
    # delivery-1 model — delete never retrains — so this also
    # measures what probing a delete-thinned frozen index costs.
    from batch_processing_on_aws_spark.operators.similarity import (  # noqa: E402
        brute_force_topk,
    )

    for scale, sf_dir in SCALES.items():
        if scale not in report:
            continue
        emb = load_table(spark, sf_dir, "embeddings")
        survivors = emb.where(F.col("vec_id") % 7 != 3)
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact_surv = _topk_sets(brute_force_topk(survivors, queries, k=K))
        approx, secs = _timed(
            lambda: qs["incremental_ivf_topk_deleted"](spark, sf_dir)
        )
        recalls = [
            len(approx.get(q, set()) & hits) / max(len(hits), 1)
            for q, hits in sorted(exact_surv.items())
        ]
        report[scale]["post_delete"] = {
            "incremental_ivf_topk_deleted": {
                "mean": round(sum(recalls) / len(recalls), 3),
                "min": round(min(recalls), 3),
                "secs": secs,
            }
        }
        print(
            f"{scale:4s} post-delete recall@{K} "
            f"mean={sum(recalls)/len(recalls):.3f} ({secs}s)",
            flush=True,
        )

    crossover = _crossover_section(spark)
    with open(out_path, "w") as f:
        json.dump(
            {
                "k": K,
                "queries": "vec_id < 5 (same as the registry queries)",
                "method": "recall@k vs brute-force cosine top-k on the "
                          "same data; 1x = sf0.1, 10x/30x = "
                          "tools/gen_scale.py clones; warmed session, "
                          "min-of-2 timings (tools/recall_bench.py)",
                "scales": report,
                "crossover": crossover,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(json.dumps({s: {n: v["mean"] for n, v in r["recall_at_k"].items()}
                      for s, r in report.items()}))


def _crossover_section(spark) -> dict:
    """The ANN-vs-brute CROSSOVER evidence (round-8 verdict task 4).

    Two measured facts, reported side by side:

    1. ``isotropic_no_crossover`` — on the registry fixture (near-
       isotropic vectors, true-neighbor cosine ≈ 0.4, barely above the
       random-pair level), NO approximate path beats brute force at
       recall ≥ 0.8 at ANY measured (scale, query-count) point: weak
       signal means recall ≈ candidate coverage, so a recall-0.8
       candidate set is ~the whole corpus and brute's straight scan
       wins. Measured honestly with a 100-query load at 10× (where
       amortizing index cost across queries gives ANN its best case).

    2. ``clustered`` — on a corpus with real cluster structure (the
       shape production embedding corpora actually have: 500 planted
       Gaussian clusters, point-to-center cosine ≈ 0.95, deterministic
       seed), IVF beats brute severalfold AT FULL RECALL, because
       cells align with clusters and a few probes cover the true
       neighbors. This is the measured crossover point: index cost
       amortizes across the 100-query load while candidates stay a
       few percent of the corpus.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F811

    from batch_processing_on_aws_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        lsh_topk_multi,
    )
    from batch_processing_on_aws_spark.plans.golden import _multi_tables
    from batch_processing_on_aws_spark.sources.readers import load_table

    out: dict = {}

    def measure(emb, queries, variants):
        exact, brute_secs = _timed(lambda: brute_force_topk(emb, queries, k=K))
        res = {"brute_secs": brute_secs, "variants": {}}
        for name, mk in variants.items():
            approx, secs = _timed(mk)
            recalls = [
                len(approx.get(q, set()) & hits) / max(len(hits), 1)
                for q, hits in sorted(exact.items())
            ]
            res["variants"][name] = {
                "secs": secs,
                "mean": round(sum(recalls) / len(recalls), 3),
                "min": round(min(recalls), 3),
                "speedup_vs_brute": round(brute_secs / max(secs, 1e-9), 2),
            }
            print(
                f"crossover {name:14s} {secs}s vs brute {brute_secs}s "
                f"recall mean={res['variants'][name]['mean']}",
                flush=True,
            )
        return res

    # 1. isotropic fixture, many-query load (ANN's best case here)
    iso_dir = SCALES.get("10x", "scaledata/x10")
    if os.path.exists(os.path.join(iso_dir, "embeddings.parquet")):
        emb = load_table(spark, iso_dir, "embeddings")
        queries = emb.where(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out["isotropic_no_crossover"] = {
            "fixture": f"{iso_dir} (near-isotropic), 100 queries",
            **measure(
                emb,
                queries,
                {
                    "ivf_16c_12p": lambda: ivf_topk(
                        emb, queries, n_cells=16, n_probe=12, k=K
                    ),
                    "ivf_64c_8p": lambda: ivf_topk(
                        emb, queries, n_cells=64, n_probe=8, k=K
                    ),
                },
            ),
        }

    # 2. clustered fixture: deterministic planted structure
    n, d, n_clusters, sigma = 50_000, 64, 500, 0.04
    rng = np.random.RandomState(20240815)
    centers = rng.randn(n_clusters, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, n)
    pts = centers[assign] + sigma * rng.randn(n, d)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(pts.astype(float)),
        }
    )
    emb_c = spark.createDataFrame(pdf).repartition(16).cache()
    emb_c.count()
    queries_c = emb_c.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out["clustered"] = {
        "fixture": (
            f"{n} x {d} planted: {n_clusters} unit-sphere Gaussian "
            f"clusters, sigma={sigma} (point-to-center cos ~0.95), "
            "seed 20240815, 100 queries"
        ),
        **measure(
            emb_c,
            queries_c,
            {
                "ivf_64c_4p": lambda: ivf_topk(
                    emb_c, queries_c, n_cells=64, n_probe=4, k=K
                ),
                "ivf_128c_4p": lambda: ivf_topk(
                    emb_c, queries_c, n_cells=128, n_probe=4, k=K
                ),
                # multi-table LSH where table-multiplicity SHOULD pay:
                # per-plane agreement p ≈ 0.9 on the planted clusters,
                # so per-table miss probability compounds across
                # independent tables (round-9 verdict task 2 — on the
                # isotropic fixture multi-LSH is dominated and says so)
                "multilsh_4x8_r1": lambda: lsh_topk_multi(
                    emb_c, queries_c, _multi_tables(4, 8), k=K,
                    probe_radius=1,
                ),
                "multilsh_4x12_r1": lambda: lsh_topk_multi(
                    emb_c, queries_c, _multi_tables(4, 12), k=K,
                    probe_radius=1,
                ),
                # matched single-table shape: same planes/radius as one
                # of the 4×12 tables — isolates what the extra tables buy
                "lsh_12p_r1": lambda: lsh_topk(
                    emb_c, queries_c, _multi_tables(1, 12)[0], k=K,
                    probe_radius=1,
                ),
                # single-table MULTI-PROBE at a matched recall target:
                # the cheaper recall lever (query-side fan-out only —
                # corpus stays 1 row/vector) multi-table competes with
                "lsh_12p_r3": lambda: lsh_topk(
                    emb_c, queries_c, _multi_tables(1, 12)[0], k=K,
                    probe_radius=3,
                ),
                # same candidate volume as multilsh_4x8_r1 (≈14% of
                # the corpus) from ONE table probed wider — the
                # dominance comparison at matched cost
                "lsh_8p_r2": lambda: lsh_topk(
                    emb_c, queries_c, _multi_tables(1, 8)[0], k=K,
                    probe_radius=2,
                ),
            },
        ),
    }
    emb_c.unpersist()
    return out


if __name__ == "__main__":
    main()
