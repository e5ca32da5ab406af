"""Scaling-curve measurement: run the most expensive registry queries
at 1×/3×/10× data (tools/gen_scale.py clones) and record growth
ratios, converting the 100-TB design claims from prose to numbers.

Usage: python tools/scale_bench.py [--json=SCALING_r04.json]

Interpretation: time(K×)/time(1×) ≈ K is linear scaling (ideal for
scan/hash-agg/bucketed-join plans on a fixed-core machine once the
work dwarfs fixed overhead). At these sizes (sf0.1 ≈ 17 MB) fixed
per-query overhead (~0.3-0.6 s of job scheduling, Python planning,
Arrow worker handshake) is a large share of 1× time, so SUB-linear
ratios mostly mean "overhead-dominated"; the red flag this tool
exists to catch is ratio >> K — quadratic candidate generation,
driver-side state, or a plan that stops broadcasting. Each timing is
min-of-2 into a noop sink, same convention as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import os as _os  # noqa: E402

# scale/skew fixtures deliberately bind the star-cap defaults — the
# cap-not-binding oracle guards do not apply to measurement runs
_os.environ["SPARK_GRAFT_SKIP_ORACLE_GUARDS"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_on_aws_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

# The dedup/ANN/curation family whose 100-TB claims need measurement,
# plus two heavy relational queries as controls. streamed_ingest_corpus
# (fixed streaming-harness overhead + scratch reuse) and the upsert
# writers (dominated by parquet write fan-out) are excluded on purpose.
QUERIES = [
    "training_corpus",
    "dup_cluster_canonical",
    "embedding_multilsh_topk",
    "jaccard_dup_pairs",
    "containment_dup_pairs",
    "doc_simhash_pairs",
    "doc_minhash_lsh_pairs",
    "dup_span_occurrences",
    "clean_corpus",
    "embedding_lsh_topk",
    "doc_token_rarity",
    "q7_nation_trade_flows",
    "pricing_summary",
    # round-6 additions under measurement: q-gram blocking (supplier
    # names clone 30x -> shared names stress the df cap), regexp-chain
    # projection, brute hard negatives, incremental agg maintenance
    "fuzzy_name_pairs",
    "html_main_text",
    "hard_negative_candidates",
    "incremental_daily_events",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "incremental_neardup_batch",
    # round-8 additions under measurement: banded Hamming image
    # pairing (planted-twin fixture must stay LINEAR in the corpus —
    # the arithmetic-pixel variant measured 916k quadratic pairs and
    # was rejected, this is the regression guard), bigram-LM scoring
    # (two corpus hash-aggs + an equi-join), KMV sketches (bounded
    # windows), and the bounded-window IVF path at its recall default
    "media_neardup_pairs",
    "doc_bigram_lm_scores",
    "kmv_distinct_users",
    "embedding_ivf_topk",
    # round-8 session-2 additions: temporal-join / dimension family —
    # the containment join must stay linear (bin explosion bounded by
    # interval/bin ratio), the SCD2 merge must track the batch not the
    # dimension, the triangle wedge join must hold its O(m^1.5) bound
    # on the support-floored graph, the rollup must scan raw ONCE
    "purchase_pit_tier",
    "scd2_incremental_user_tier",
    "part_copurchase_triangles",
    "event_multires_rollup",
    # round-9 additions: the min/max CDC retraction (touched-group
    # recompute must track the delta, never the state), the quantile
    # sketch (hash-agg + sketch-sized window — the bounded-window
    # claim under measurement), and the real PNG decode path (Arrow
    # batch scaling of the zlib+unfilter kernel).
    # customer_ring_scc is EXCLUDED on purpose: its fixture caps at
    # 2000 keys so the cross-engine closure stays cheap — constant
    # size by design, a scaling curve would measure nothing.
    "cdc_incremental_minmax",
    "event_value_quantile_sketch",
    "media_phash_png",
    # round-9 session-2 additions: the weighted-cosine join must hold
    # the df-cap linearity bound (vocab scales with the corpus — the
    # candidate self-join is the risk), the sketch-algebra family must
    # track sketch sizes not data (ledger O(batch); trailing frames
    # O(days·window·k); pair overlap O(groups²·k); quantile
    # normalization's global cumulative stays ≤7.3k bucket rows)
    "tfidf_cosine_doc_pairs",
    "trailing_distinct_users",
    "source_vocab_overlap",
    "incremental_kmv_users",
    "normalized_doc_lengths",
    # round-9 session-3: the prefix-filter exact Jaccard self-join —
    # the zero-false-negative complement of the df-capped index; its
    # prefix+size filters must keep candidates near-linear as the
    # corpus grows
    "prefix_jaccard_doc_pairs",
    # round-10 additions: the real-codec multimodal paths (JPEG
    # Huffman+IDCT, WARC container parse+extract, AVI walk + per-frame
    # JPEG decode, WAV + integer WHT) are Arrow-batched 1-to-N
    # projections that must scale with payload bytes, and the clip/
    # audio pair miners must stay LINEAR in the corpus (df-capped
    # hash self-joins — the media_neardup_pairs regression-guard
    # argument, extended to the new modalities). bpe_tokenized_docs
    # is the corpus-sized BPE application (per-batch word memo —
    # throughput must track the vocabulary, not the token count).
    "media_phash_jpeg",
    "warc_main_text",
    "video_mjpeg_phash",
    "video_shared_frame_pairs",
    "audio_shared_window_pairs",
    "bpe_tokenized_docs",
    # round-11 additions: the standing IVF index (scratch reuse means
    # min-of-2 measures the PROBE path over the incrementally-built
    # assignment table — candidates ≈ N·n_probe/n_cells must scale
    # linearly; the one-time build cost is the first run), the
    # corpus-sized unigram application (per-batch word memo — same
    # throughput-tracks-vocabulary claim as bpe_tokenized_docs), and
    # the bloom layout audit (the WRITE scales with the fact, the
    # footer+bitset audit is metadata-sized by construction).
    "incremental_ivf_topk",
    "unigram_tokenized_docs",
    "bloom_layout_audit",
    # round-11 session-2 additions: the standing BM25 index (scratch
    # reuse means min-of-2 measures the SEARCH path — a projected
    # postings scan + per-row array filter, no tokenize, no df agg —
    # which must scale with the postings table, and the stats probe
    # is vocab-row metadata), the standing cluster assignment (the
    # labels read must scale with the label table), the corpus-sized
    # WordPiece application (throughput tracks the vocabulary), and
    # the one-pass funnel (one conditional agg + one closure run).
    "standing_bm25_search",
    "incremental_dup_clusters",
    "wordpiece_tokenized_docs",
    "curation_funnel_report",
    # round-12 additions: the incremental SemDeDup fold (scratch reuse
    # means min-of-2 measures the AUDIT read of the standing state —
    # must scale with the state table; the fold itself is exercised on
    # the first run, whose cost is the within-touched-cell equi-join,
    # never all-pairs), and the post-delete IVF probe (survivor-set
    # candidates ≈ N·n_probe/n_cells, same linearity claim as
    # incremental_ivf_topk over a delete_keys-filtered table).
    "streamed_semantic_corpus",
    "incremental_ivf_topk_deleted",
    # round-13 additions: the takedown/retraction family (r12 verdict
    # task 4 — the delete paths had no scale evidence). Scratch reuse
    # means min-of-2 measures the standing READ after the maintenance
    # pass (labels/state/postings scans over delete-folded tables,
    # which must scale with the table); the first run pays the pass
    # itself — pair-ledger cluster retraction (affected-cluster
    # scoping must track the removed docs' clusters, never the
    # ledger), membership removal, the post-delete BM25 search, and
    # the SemDeDup un-drop recompute (touched-cell pruned).
    "standing_bm25_after_delete",
    "dup_clusters_after_removal",
    "dup_clusters_retracted",
    "semantic_corpus_after_removal",
]

SCALES = {
    "1x": "/root/testdata/sf0.1",
    "3x": "scaledata/x3",
    "10x": "scaledata/x10",
}
# round-6: a 30x point (scaledata/x30, ~0.5 GB of parquet — real I/O,
# not page-cache noise) extends the curve far enough that linear vs
# quadratic candidate generation separates unambiguously
if os.path.isdir("scaledata/x30"):
    SCALES["30x"] = "scaledata/x30"


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    out_path = "SCALING_r04.json"
    only = []
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
        elif not a.startswith("--"):
            only.append(a)
    # positional names restrict the run (targeted additions fold into
    # the existing curve via the per-query merge below); unknown names
    # are a hard error — a typo'd targeted run must not silently
    # measure nothing and rewrite the sidecar anyway
    unknown = sorted(set(only) - set(QUERIES))
    if unknown:
        raise SystemExit(f"unknown scale-bench queries: {unknown}")
    queries = [q for q in QUERIES if not only or q in only]
    spark = get_spark(app_name="scale_bench")
    qs = entrymod.queries()

    # warm JVM + Python worker pool (same rationale as bench.py)
    run_query(qs["pricing_summary"](spark, SCALES["1x"]))

    results: dict[str, dict[str, float]] = {name: {} for name in queries}
    for scale, sf_dir in SCALES.items():
        for name in queries:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run_query(qs[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            results[name][scale] = round(best, 3)
            print(f"{scale:>4} {name:28s} {best:7.2f}s", flush=True)

    report = {}
    for name, t in results.items():
        g3 = round(t["3x"] / t["1x"], 2)
        g10 = round(t["10x"] / t["1x"], 2)
        report[name] = {
            **t,
            "growth_3x": g3,
            "growth_10x": g10,
            # >1.5×K = super-linear beyond machine noise at this size
            "superlinear": g10 > 15.0,
        }
        if "30x" in t:
            g30 = round(t["30x"] / t["1x"], 2)
            report[name]["growth_30x"] = g30
            report[name]["superlinear"] = (
                report[name]["superlinear"] or g30 > 45.0
            )
    doc = {
        "scales": SCALES,
        "method": "min of 2 runs, noop sink, shared session, copies are "
                  "content-disjoint re-keyed clones (tools/gen_scale.py)",
        "queries": report,
        "flagged_superlinear": sorted(
            n for n, r in report.items() if r["superlinear"]
        ),
    }
    # MERGE into an existing file (e.g. the streaming curve from
    # tools/stream_scale_bench.py lives under "stream_span_ledger")
    merged = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            merged = json.load(f)
    # per-query merge: a targeted run (trimmed QUERIES list) folds its
    # rows into the existing curve instead of clobbering prior
    # coverage; flagged_superlinear is recomputed over the union
    all_queries = dict(merged.get("queries", {}))
    all_queries.update(doc["queries"])
    merged.update(doc)
    merged["queries"] = all_queries
    merged["flagged_superlinear"] = sorted(
        n
        for n, r in all_queries.items()
        if isinstance(r, dict) and r.get("superlinear")
    )
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(json.dumps({"flagged": merged["flagged_superlinear"]}))


if __name__ == "__main__":
    main()
