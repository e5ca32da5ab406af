"""Skew A/B bench for the dedup family (round-4 verdict task 8;
round-5 adds the verification-join family — jaccard/containment/
verified-pairs — under the same 20%-hot-template corpus, which is the
df-cap's adversarial case: the template's shingles are hot in both the
inverted index and the verification join).

Builds two same-size corpora from sf0.1:

- **uniform**: documents/embeddings as generated (near-dup groups are
  small and spread across LSH buckets / k-means cells);
- **skewed**: 20% of documents are near-duplicates of ONE template
  (unique per-doc suffix token, so they collapse into the same MinHash
  band buckets without being exact dups), and 20% of embeddings sit in
  a tight ball around one template vector (same k-means cell).

Then times ``doc_minhash_lsh_pairs`` and ``semantic_dedup_kept`` on
both (min of 2, noop sink) and records the skew/uniform wall-time
ratio in SKEW_r04.json.

What the ratio means: the skewed corpus does strictly MORE semantic
work — one bucket holds 20% of docs, so its within-bucket candidate
volume is quadratic in the hot-bucket size (that's real output, not a
plan artifact). The scale claim under test is that the plan
PARALLELIZES the hot bucket (AQE skew-split on shuffle joins, hash
partial aggs) instead of serializing on one reducer — wall time within
~2x of uniform at this size, rather than the ~(0.2N)^2/cores blowup a
single-task hot partition would show.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

import os as _os  # noqa: E402

# scale/skew fixtures deliberately bind the star-cap defaults — the
# cap-not-binding oracle guards do not apply to measurement runs
_os.environ["SPARK_GRAFT_SKIP_ORACLE_GUARDS"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_on_aws_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = "scaledata/skew"
QUERIES = [
    "doc_minhash_lsh_pairs",
    "semantic_dedup_kept",
    # the skewed corpus also makes every 20-token window of the shared
    # template a hot span hash (~20% of docs contain it), exercising
    # the aggregate-min keep-first path in remove_duplicate_spans
    "dup_span_occurrences",
    "dedup_spans_removed",
    # round-5: the verification-join family under the df-cap's
    # adversarial case — the template's shingles are hot (df ≈ 20% of
    # docs), so the inverted index must cap them and the pairwise
    # verification join must split the surviving hot candidates
    "jaccard_dup_pairs",
    "containment_dup_pairs",
    "neardup_verified_pairs",
    # round-6: the fuzzy ingest path's bucket-min policy is built for
    # exactly this corpus — 20% of the batch in one template bucket
    # must cost O(m) and emit LINEAR kept-rows, never a clique
    "incremental_neardup_batch",
    # round-9: the TEMPORAL-join family under a hot entity — 20% of
    # all events reassigned to ONE user, so (a) that user's SCD2
    # collapse window holds 20% of the observations (real per-key
    # work, one sort partition) and (b) the PIT containment join's
    # (user_id, day-bin) keys are hot on both sides — the case AQE
    # skew-split and the bucketized interval_join plan must absorb
    "user_tier_scd2",
    "purchase_pit_tier",
    # round-9 session-2: the weighted-cosine join under the SAME hot
    # template — 20% of docs share one vocabulary, so every template
    # token's df explodes past max_df and must fall out of the
    # candidate BLOCKING (the documented contract) while the weight/
    # norm hash-aggs absorb the hot tokens map-side
    "tfidf_cosine_doc_pairs",
    # round-11: the standing IVF index under a hot embedding — 20% of
    # vectors are ONE template point, so a single quantizer cell holds
    # a fifth of the corpus: assignment stays a shuffle-free map, and
    # the hot cell only inflates the probe join's candidate list for
    # queries that probe it (AQE skew-split absorbs the join side);
    # and the unigram application under the hot template text — the
    # per-batch word memo segments the shared vocabulary once per
    # batch, so hot words cost memo lookups, not re-segmentation
    "incremental_ivf_topk",
    "unigram_tokenized_docs",
    # round-11 session-2: the standing BM25 index under the hot
    # template — 20% of docs share one vocabulary, so the template
    # terms' df rows become corpus-hot: the stats fold absorbs them
    # in ONE vocab-keyed hash-agg (map-side partials), search still
    # filters per-row postings arrays before exploding, and the only
    # skew surface is the per-doc score agg (doc-keyed, not
    # term-keyed — deliberately immune to hot terms); and the
    # standing cluster fold under the template's hot band bucket —
    # the star-capped pair stream keeps the contracted graph linear,
    # so the fold's CC rounds stay bounded
    "standing_bm25_search",
    "incremental_dup_clusters",
    # round-12: the incremental SemDeDup fold under the hot embedding
    # — 20% of vectors are ONE template point, so a single frozen cell
    # holds a fifth of the corpus. The within-cell compare is
    # all-pairs BY SEMANTICS (the paper's within-cluster step), so the
    # candidate volume in the hot cell is real quadratic work that
    # must PARALLELIZE (AQE skew-split on the cell equi-join) while
    # the OUTPUT stays linear (distinct dropped ids — every template
    # copy needs only its one min-id witness); the standing-state read
    # side is cell-filtered so cold cells never join
    "streamed_semantic_corpus",
    # round-13: the deletion/retraction family under the same hot
    # fixtures (r12 verdict task 4). The hot template cluster is the
    # adversarial case for retraction: the removed docs' affected
    # cluster holds 20% of the corpus, so the ledger filter + CC
    # re-close run over the star-capped hot cluster's edges (linear
    # by the star contract, never C(m,2)); the SemDeDup un-drop
    # recomputes the HOT cell (real quadratic-by-semantics candidate
    # volume that must parallelize, exactly the streamed_semantic_
    # corpus argument); the post-delete BM25 search and post-removal
    # label read must stay scans of delete-folded state.
    "standing_bm25_after_delete",
    "dup_clusters_after_removal",
    "dup_clusters_retracted",
    "semantic_corpus_after_removal",
    # round-14 (r13 verdict task 8): the salted ball join's OWN A/B —
    # the same one-shot SemDeDup with the within-cell compare pinned
    # to ONE slice per cell (the naive equi-join baseline whose hot
    # cell serializes its quadratic compare on a single task) vs the
    # default adaptive slicing above (semantic_dedup_kept). Committed
    # evidence for the win that previously lived only in the r13
    # commit message's 30x anecdote.
    "semantic_dedup_kept_slices1",
]


def build(root: str = ROOT, src: str = SRC, hot_pct: int = 20) -> None:
    con = duckdb.connect()
    for variant in ("uniform", "skewed"):
        os.makedirs(os.path.join(root, variant), exist_ok=True)
    # uniform = passthrough copies (same files, same layout)
    for t in ("documents", "embeddings"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO "
            f"'{root}/uniform/{t}.parquet' (FORMAT parquet)"
        )
    tmpl_text = con.sql(
        f"SELECT text FROM read_parquet('{src}/documents.parquet') "
        "ORDER BY doc_id LIMIT 1"
    ).fetchone()[0].replace("'", "''")
    con.sql(
        f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % {100 // hot_pct} = 0
                      THEN '{tmpl_text}' || ' uniq' || CAST(doc_id AS VARCHAR)
                      ELSE text END AS text,
                 lang, source,
                 CAST(length(CASE WHEN doc_id % {100 // hot_pct} = 0
                      THEN '{tmpl_text}' || ' uniq' || CAST(doc_id AS VARCHAR)
                      ELSE text END) AS BIGINT) AS n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{root}/skewed/documents.parquet' (FORMAT parquet)"""
    )
    tmpl_vec = con.sql(
        f"SELECT embedding FROM read_parquet('{src}/embeddings.parquet') "
        "ORDER BY vec_id LIMIT 1"
    ).fetchone()[0]
    lit = "[" + ", ".join(f"{v!r}" for v in tmpl_vec) + "]::FLOAT[]"
    con.sql(
        f"""
        COPY (
          SELECT vec_id,
                 CASE WHEN vec_id % {100 // hot_pct} = 0
                      THEN CAST(list_transform(range(1, len(embedding) + 1),
                           i -> ({lit})[i] * 0.95 + embedding[i] * 0.05)
                           AS FLOAT[])
                      ELSE embedding END AS embedding,
                 label
          FROM read_parquet('{src}/embeddings.parquet')
        ) TO '{root}/skewed/embeddings.parquet' (FORMAT parquet)"""
    )
    # temporal skew: 20% of ALL events reassigned to one hot user
    # (event ids, timestamps, types untouched — the entity dimension
    # is what concentrates). Uniform = passthrough copy.
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{src}/events.parquet')) TO "
        f"'{root}/uniform/events.parquet' (FORMAT parquet)"
    )
    hot_user = con.sql(
        f"SELECT MIN(user_id) FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]
    con.sql(
        f"""
        COPY (
          SELECT event_id, ts,
                 CASE WHEN event_id % {100 // hot_pct} = 0
                      THEN CAST({hot_user} AS BIGINT)
                      ELSE user_id END AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet')
        ) TO '{root}/skewed/events.parquet' (FORMAT parquet)"""
    )


def main() -> None:
    # positional names restrict the run (round-13, the scale_bench
    # convention): targeted additions fold into the existing sidecar
    # via the per-query merge below; unknown names are a hard error
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    unknown = sorted(set(only) - set(QUERIES))
    if unknown:
        raise SystemExit(f"unknown skew-bench queries: {unknown}")
    queries = [q for q in QUERIES if not only or q in only]
    build()
    spark = get_spark(app_name="skew_bench")
    qs = dict(entrymod.queries())
    # The registry doc_minhash_lsh_pairs wrapper ASSERTS the star-cap
    # is not binding (its uncapped DuckDB oracle is only valid then) —
    # this harness runs the deliberately-oversized template corpus
    # where the cap binding is the POINT, so measure the operator at
    # the same defaults without the parity-contract guard.
    from batch_processing_on_aws_spark.operators.neardup import (
        minhash_lsh_pairs,
    )
    from batch_processing_on_aws_spark.sources.readers import load_table

    qs["doc_minhash_lsh_pairs"] = lambda s, d: minhash_lsh_pairs(
        load_table(s, d, "documents")
    )
    # naive single-slice ball-join baseline (round-14): the registry
    # semantic_dedup_kept shape with the within-cell compare forced to
    # one slice per cell
    from batch_processing_on_aws_spark.operators.similarity import (
        semantic_dedup,
    )

    qs["semantic_dedup_kept_slices1"] = lambda s, d: semantic_dedup(
        load_table(s, d, "embeddings"), n_cells=16, tau=0.4, ball_slices=1
    )

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    run(qs[QUERIES[0]](spark, f"{ROOT}/uniform"))  # warm

    # pair-emitting queries: also record OUTPUT rows per variant — a
    # hot clique of m docs has C(m,2) true pairs, so for these the
    # wall-time ratio tracks the output's own quadratic growth (real
    # result rows, not a serialized plan); rows make that legible
    PAIR_QUERIES = {
        "doc_minhash_lsh_pairs",
        "jaccard_dup_pairs",
        "containment_dup_pairs",
        "neardup_verified_pairs",
        # not pair-shaped (kept docs), tracked for the same reason:
        # the output size is the skew story
        "incremental_neardup_batch",
    }
    times: dict[str, dict[str, float]] = {q: {} for q in queries}
    rows: dict[str, dict[str, int]] = {q: {} for q in queries}
    for variant in ("uniform", "skewed"):
        for q in queries:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run(qs[q](spark, f"{ROOT}/{variant}"))
                best = min(best, time.perf_counter() - t0)
            times[q][variant] = round(best, 3)
            if q in PAIR_QUERIES:
                rows[q][variant] = qs[q](spark, f"{ROOT}/{variant}").count()
            print(f"{variant:8s} {q:24s} {best:6.2f}s", flush=True)

    out_path = "SKEW_r06.json"
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    report = {
        q: {**t, "skew_ratio": round(t["skewed"] / t["uniform"], 2)}
        for q, t in times.items()
    }
    for q, r in rows.items():
        if r:
            report[q]["out_rows"] = r
            report[q]["out_rows_ratio"] = round(
                r["skewed"] / max(r["uniform"], 1), 1
            )
    # per-query merge into an existing sidecar (the scale_bench
    # convention): a targeted run folds its rows in instead of
    # clobbering prior coverage
    doc = {
        "hot_pct": 20,
        "method": "min of 2, noop sink; skewed = 20% of docs "
                  "near-dup one template / 20% of vectors in one "
                  "cell (tools/skew_bench.py)",
        "queries": report,
    }
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
        all_queries = dict(merged.get("queries", {}))
        all_queries.update(report)
        merged.update(doc)
        merged["queries"] = all_queries
        doc = merged
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(
        {q: r["skew_ratio"] for q, r in doc["queries"].items()}
    ))


if __name__ == "__main__":
    main()
