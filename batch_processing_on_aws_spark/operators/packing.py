"""Sequence packing: assign documents to fixed token-budget training
sequences (the "concat-then-chunk" layout every LLM dataloader uses).

Documents are laid end-to-end in a deterministic order and the stream
is cut every ``budget`` tokens; each document records the sequence it
STARTS in and its token offset there (a doc longer than the remaining
budget simply spills into the next sequence — the chunker, not this
planner, handles the split). Because the layout is a pure function of
(order key, token counts), the assignment is reproducible across runs
and engines — same property the hash split (operators/sampling.py)
guarantees, for the same reason: re-ingesting the corpus must not
silently reshuffle what the model sees.

Scale design: packing is a running sum, i.e. a window — and a GLOBAL
window is a single-reducer total order, unacceptable at 100 TB. The
operator therefore packs WITHIN a shard column (source, date bucket,
path prefix …): each shard is an independent contiguous stream, the
window partitions by shard, and sequence ids are (shard, seq_no)
pairs. That is exactly how production packers shard anyway (files are
packed independently); a global pack is the degenerate single-shard
call and is left to small inputs.

The reference has no packing surface; this extends the engine for the
LLM-pipeline use cases (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    shard_col: str | None = None,
) -> DataFrame:
    """Add ``seq_no`` (0-based sequence number within the shard) and
    ``seq_offset`` (token offset of this doc's first token inside that
    sequence) columns.

    ``order_col`` must be unique within a shard (a doc id) so the
    layout is total-ordered and deterministic. All arithmetic is
    integer — bit-identical in any engine.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(shard_col) if shard_col is not None else Window
    ).orderBy(order_col)
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(before), F.lit(0).cast("long")
    )
    return df.withColumn("seq_no", F.floor(start / budget).cast("long")).withColumn(
        "seq_offset", (start % budget).cast("long")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap
    — the context-window prep step that pairs with ``pack_sequences``
    (packing lays whole docs into sequences; chunking cuts docs that
    exceed the window). Stride = ``chunk_size − overlap``; the last
    chunk may be short; docs at or under ``chunk_size`` tokens yield
    exactly one chunk; empty docs yield one empty chunk (kept, so a
    chunk-count audit reconciles with the doc count).

    Pure per-row explode of a token-array slice expression — no
    shuffle, no Python; chunk counts are a closed-form function of
    the token count so the generator never re-tokenizes per chunk.

    Output: (id, chunk_id 0-based, chunk_text, chunk_tokens).
    """
    from .textstats import tokens

    if overlap >= chunk_size:
        raise ValueError(
            f"overlap={overlap} must be < chunk_size={chunk_size}"
        )
    stride = chunk_size - overlap
    toks = F.col("__toks")
    n = F.size(toks)
    # ceil((n - overlap) / stride) via integer arithmetic, floored at 1
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.floor((n - overlap + stride - 1) / F.lit(stride)),
    )
    chunk = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id")
    sliced = F.slice(toks, F.col("chunk_id") * stride + 1, chunk_size)
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), "__toks", chunk)
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(sliced, " ").alias("chunk_text"),
            F.size(sliced).cast("long").alias("chunk_tokens"),
        )
    )
