"""Benchmark decontamination: find training documents that share
word n-grams with a held-out/benchmark set.

The standard LLM-pipeline hygiene step (the reference has no
counterpart — SURVEY.md §2.10 extension surface): before training,
every document that textually overlaps an evaluation benchmark must be
flagged or dropped, or downstream eval numbers are meaningless. The
canonical detector is exact n-gram collision (WikiText/GPT-2/GPT-3
style "13-gram overlap"), which is a pure inverted-index problem — no
similarity scoring needed, just set intersection counts.

Scale design: the benchmark side is SMALL by construction (eval sets
are thousands of documents, the corpus is billions), so its exploded
shingle index is broadcast — the 100 TB corpus side streams through a
broadcast hash join with NO shuffle of corpus rows. The only shuffle
is the final aggregate over (corpus_doc, bench_doc) pairs that
actually collide, which is output-sized, not corpus-sized. Shingling
is the same md5-portable machinery as near-dup (operators/neardup.py),
so a DuckDB oracle reproduces the report bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .neardup import shingle_index


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """(corpus_doc_id, bench_doc_id, n_overlap, containment) for every
    corpus×benchmark pair sharing ≥ ``min_overlap`` distinct word
    ``shingle_n``-grams. ``containment`` = |overlap| / |benchmark
    doc's distinct shingles| — 1.0 means the benchmark doc's entire
    shingle set appears in the corpus doc (a verbatim inclusion).

    Both ratio operands are exact integers; the division is the only
    float op, identical in any engine.
    """
    corpus_idx = shingle_index(
        corpus, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    ).withColumnRenamed("__id", "corpus_doc_id")
    bench_idx = shingle_index(
        benchmark, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    ).withColumnRenamed("__id", "bench_doc_id")
    bench_sizes = bench_idx.groupBy("bench_doc_id").agg(
        F.count(F.lit(1)).alias("__bench_n")
    )
    overlaps = (
        corpus_idx.join(F.broadcast(bench_idx), "__s")
        .groupBy("corpus_doc_id", "bench_doc_id")
        # shingle_index rows are distinct per doc, so a plain count IS
        # the distinct-overlap count
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .where(F.col("n_overlap") >= min_overlap)
    )
    return overlaps.join(F.broadcast(bench_sizes), "bench_doc_id").select(
        "corpus_doc_id",
        "bench_doc_id",
        "n_overlap",
        F.round(F.col("n_overlap") / F.col("__bench_n"), 6).alias("containment"),
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    planes: list[list[float]],
    tau: float = 0.95,
    corpus_id_col: str = "vec_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    partitions: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination — the semantic sibling of the
    n-gram collision report: flag corpus items whose embedding sits
    within cosine ``tau`` of any benchmark item, catching paraphrased
    or translated eval leakage that exact n-grams miss.

    Same scale contract as the n-gram path: the benchmark side is
    small by construction and BROADCASTS; both sides bucket on a
    hyperplane signature (operators/similarity.py machinery) so the
    probe is an equi-join on the bucket, the corpus never shuffles,
    and only colliding candidates get cosine-rescored. Recall is the
    LSH recall at ``len(planes)`` bits — raise it with fewer planes
    or a multi-table union (``similarity.lsh_topk_multi`` pattern).

    Output: (corpus id, bench id, cos_sim ≥ tau) — rounded before
    thresholding for cross-engine reproducibility.
    """
    from .similarity import _as_double, cosine, hyperplane_signature
    from .partitioning import fan_out

    c = fan_out(corpus, partitions).select(
        F.col(corpus_id_col).alias("__cid"),
        _as_double(F.col(vec_col)).alias("__cv"),
    )
    c = c.withColumn("__bucket", hyperplane_signature(F.col("__cv"), planes))
    b = F.broadcast(
        benchmark.select(
            F.col(bench_id_col).alias("__bid"),
            _as_double(F.col(vec_col)).alias("__bv"),
        ).withColumn("__bucket", hyperplane_signature(F.col("__bv"), planes))
    )
    return (
        c.join(b, "__bucket")
        .select(
            F.col("__cid").alias(corpus_id_col),
            F.col("__bid").alias(bench_id_col),
            F.round(cosine(F.col("__cv"), F.col("__bv")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= tau)
    )


def remove_semantic_contaminated(
    corpus: DataFrame,
    corpus_vectors: DataFrame,
    benchmark_vectors: DataFrame,
    planes: list[list[float]],
    tau: float = 0.95,
    id_col: str = "doc_id",
    corpus_vec_id_col: str = "vec_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """REMOVAL form of the paraphrase case: drop from ``corpus`` every
    document whose embedding sits within cosine ``tau`` of any
    benchmark vector (:func:`semantic_contamination` decides; this
    applies). The n-gram case has a finer treatment — excise just the
    colliding span (:func:`remove_contaminated_spans`) — but a
    PARAPHRASED leak is not span-localizable: the whole document is
    the leak unit, so doc-drop is the correct excision granularity
    (the same contract Gopher/Llama-style decontamination applies to
    fuzzy eval overlap).

    ``corpus_vectors`` maps ``corpus_vec_id_col`` → embedding, with
    ids in ``corpus``'s ``id_col`` space (the documents/embeddings
    tables here are row-aligned). Scale: the flagged set is
    output-sized (docs near an eval vector — tiny by construction),
    so the final anti-join broadcasts it; the corpus streams through
    without a shuffle, same as the flag path it composes.

    Output: the surviving subset of ``corpus``, schema unchanged.
    """
    flagged = (
        semantic_contamination(
            corpus_vectors,
            benchmark_vectors,
            planes,
            tau=tau,
            corpus_id_col=corpus_vec_id_col,
            bench_id_col=bench_id_col,
            vec_col=vec_col,
        )
        .select(F.col(corpus_vec_id_col).alias(id_col))
        .distinct()
    )
    return corpus.join(flagged, id_col, "left_anti")


def remove_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_text_col: str = "text",
    corpus_id_col: str = "doc_id",
    bench_text_col: str = "text",
    window: int = 13,
) -> DataFrame:
    """Span-level decontamination — the REMOVAL form of the n-gram
    hygiene step: excise from every corpus document each
    ``window``-token span whose text occurs anywhere in the benchmark
    (the GPT-3-appendix-style "remove the colliding 13-gram and its
    surroundings" treatment, strictly stronger than dropping flagged
    docs: the rest of the document survives).

    Composition of the span-ledger machinery the engine already
    trusts: the benchmark's positional span hashes form the ledger
    (``neardup.span_windows``), and the corpus is rebuilt with
    ``neardup.remove_spans_against_ledger`` — one hash-key semi-join
    to find covered positions, one grouped rebuild; nothing pairwise,
    nothing driver-side. Within-corpus duplicate spans are NOT cut
    (keep-first applies only against the benchmark here — pass the
    corpus through ``remove_duplicate_spans`` separately for that).

    Output: (doc_id, text, n_tokens_removed) for every corpus doc.
    At 100 TB the benchmark ledger is tiny by construction (eval sets
    are thousands of docs), so the semi-join broadcasts it.
    """
    from .neardup import remove_spans_against_ledger, span_windows

    # synthetic benchmark ids: only the span HASHES survive into the
    # ledger, so the id is never observed downstream
    bench = benchmark.select(
        F.monotonically_increasing_id().alias("__bid"),
        F.col(bench_text_col).alias("__btext"),
    )
    ledger = span_windows(
        bench, text_col="__btext", id_col="__bid", window=window
    ).select("span_hash")
    cleaned, _ = remove_spans_against_ledger(
        corpus,
        ledger,
        text_col=corpus_text_col,
        id_col=corpus_id_col,
        window=window,
        within_batch=False,
    )
    return cleaned
