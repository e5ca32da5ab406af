"""Incrementally-maintained BM25 index (operators/text_index.py +
streaming/incremental.py::ingest_text_index_stream): the Lucene
index-once/search-many lifecycle — O(batch) postings upserts,
change-feed-folded df/N/Σlen statistics (including decrements),
tombstoned vocab rows, crash-replay routing, and search parity with
the one-shot ``bm25_search``."""

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.text_index import TextIndex
from batch_processing_on_aws_spark.operators.textstats import bm25_search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "spark shuffles data between stages"),
    (2, "the index maintains postings incrementally"),
    (3, "bm25 scores saturate term frequency"),
    (4, "spark spark spark broadcast joins"),
    (5, ""),
    (6, None),
    (7, "postings arrays stay term sorted"),
]


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tidx")


def _scores(df):
    return [tuple(r) for r in df.collect()]


def test_build_add_matches_one_shot(spark, root):
    """build(d1) + add(d2) == bm25_search over d1 ∪ d2, including
    empty and NULL texts (they count toward N, contribute 0 to
    Σlen, and never score)."""
    full = _docs(spark, CORPUS)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.build(full.where(F.col("doc_id") <= 4))
    idx.add(full.where(F.col("doc_id") > 4))
    got = _scores(idx.search(spark, ["spark", "postings"], top_k=5))
    want = _scores(bm25_search(full, ["spark", "postings"], top_k=5))
    assert got == want and len(got) > 0

    meta = idx.corpus_stats(spark).collect()[0]
    assert meta["n_docs"] == 7
    assert meta["sum_len"] == sum(
        len(t.split()) for _, t in CORPUS if t
    )


def test_update_decrements_df_and_tombstones(spark, root):
    """A re-delivered doc REPLACES its postings: vanished terms' df
    decrements through the signed fold; a term whose last holder is
    replaced drops to a df=0 tombstone hidden from term_stats but
    still present as a stats-table row (later re-insert folds onto
    it)."""
    full = _docs(spark, CORPUS)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.build(full)
    assert {
        r["term"]: r["df"]
        for r in idx.term_stats(spark)
        .where(F.col("term").isin(["bm25", "spark"]))
        .collect()
    } == {"bm25": 1, "spark": 2}

    idx.add(_docs(spark, [(3, "replaced entirely"), (4, "replaced entirely")]))
    stats = {r["term"]: r["df"] for r in idx.term_stats(spark).collect()}
    assert "bm25" not in stats  # tombstoned, hidden
    assert stats["spark"] == 1  # doc 4 no longer holds it
    assert stats["replaced"] == 2
    raw = {
        r["term"]: r["df"]
        for r in idx.stats.read(spark).where(F.col("term") == "bm25").collect()
    }
    assert raw == {"bm25": 0}  # the tombstone row itself

    # re-insert folds onto the tombstone
    idx.add(_docs(spark, [(9, "bm25 returns")]))
    assert {
        r["term"]: r["df"]
        for r in idx.term_stats(spark).where(F.col("term") == "bm25").collect()
    } == {"bm25": 1}

    # the full state still equals a from-scratch index
    current = _docs(
        spark,
        [r for r in CORPUS if r[0] not in (3, 4)]
        + [(3, "replaced entirely"), (4, "replaced entirely"), (9, "bm25 returns")],
    )
    got = _scores(idx.search(spark, ["spark", "replaced", "bm25"], top_k=10))
    want = _scores(bm25_search(current, ["spark", "replaced", "bm25"], top_k=10))
    assert got == want


def test_unchanged_redelivery_is_stats_invisible(spark, root):
    """Value-equal re-delivery ⇒ the change feed is empty ⇒ stats and
    meta versions still advance idempotently but content is
    unchanged (the CDC value-compare filters rewritten-identical
    rows)."""
    full = _docs(spark, CORPUS)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.build(full)
    before_stats = sorted(_scores(idx.stats.read(spark)))
    before_meta = _scores(idx.corpus_stats(spark))
    idx.add(full.where(F.col("doc_id") <= 3))  # identical rows again
    assert sorted(_scores(idx.stats.read(spark))) == before_stats
    assert _scores(idx.corpus_stats(spark)) == before_meta


def test_batch_duplicate_ids_collapse_deterministically(spark, root):
    """Two rows with one doc_id in a single batch collapse to the
    min-md5(text) winner BEFORE tokenization, so postings always
    describe one text and stats fold once."""
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    texts = ["alpha beta", "gamma delta"]
    import hashlib

    winner = min(texts, key=lambda t: hashlib.md5(t.encode()).hexdigest())
    idx.build(_docs(spark, [(1, texts[0]), (1, texts[1])]))
    row = idx.postings.read(spark).collect()
    assert len(row) == 1
    assert [e["term"] for e in row[0]["tfs"]] == sorted(winner.split())
    assert idx.corpus_stats(spark).collect()[0]["n_docs"] == 1


def test_crash_replay_routing_and_idempotency(spark, root):
    """apply() with txn stamps: a replayed build epoch re-enters
    build (the .p0 stamp), a replayed add epoch skips every applied
    half — state identical after replays; and a partially-applied
    add epoch (postings committed, stats/meta not) completes on
    replay instead of double-folding."""
    full = _docs(spark, CORPUS)
    d1 = full.where(F.col("doc_id") <= 4)
    d2 = full.where(F.col("doc_id") > 4)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.apply(d1, txn={"app": "t", "epoch": 0})
    idx.apply(d1, txn={"app": "t", "epoch": 0})  # replayed build epoch
    assert idx.postings.latest_version() == 1

    idx.apply(d2, txn={"app": "t", "epoch": 1})
    snap_stats = sorted(_scores(idx.stats.read(spark)))
    snap_meta = _scores(idx.corpus_stats(spark))
    idx.apply(d2, txn={"app": "t", "epoch": 1})  # full replay: all noop
    assert idx.postings.latest_version() == 2
    assert sorted(_scores(idx.stats.read(spark))) == snap_stats
    assert _scores(idx.corpus_stats(spark)) == snap_meta

    # partial epoch: commit postings half only, then replay the epoch
    d3 = _docs(spark, [(10, "late arriving doc")])
    p = idx._postings_rows(d3)
    idx.postings.upsert(spark, p, txn={"app": "t.p", "epoch": 2})
    idx.apply(d3, txn={"app": "t", "epoch": 2})  # completes stats+meta
    assert idx.corpus_stats(spark).collect()[0]["n_docs"] == 8
    assert {
        r["term"]: r["df"]
        for r in idx.term_stats(spark).where(F.col("term") == "late").collect()
    } == {"late": 1}

    got = _scores(idx.search(spark, ["spark", "late"], top_k=10))
    want = _scores(
        bm25_search(
            full.unionByName(d3), ["spark", "late"], top_k=10
        )
    )
    assert got == want


def test_replay_after_interleaved_compact_folds_correct_feed(spark, root):
    """A crash-replayed add epoch must re-derive ITS OWN commit's
    change feed even when maintenance (compact) minted versions
    between the crash and the replay — resolving latest-1 would diff
    the compact's empty change set and silently drop the epoch's
    stats/meta deltas."""
    full = _docs(spark, CORPUS)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.apply(full.where(F.col("doc_id") <= 4), txn={"app": "t", "epoch": 0})
    # epoch 1 crashes after the postings half only
    d = _docs(spark, [(10, "late arriving doc")])
    idx.postings.upsert(
        spark, idx._postings_rows(d), txn={"app": "t.p", "epoch": 1}
    )
    # maintenance interleaves before the stream restarts
    idx.postings.compact(spark)
    idx.apply(d, txn={"app": "t", "epoch": 1})  # replay completes the epoch
    assert {
        r["term"]: r["df"]
        for r in idx.term_stats(spark).where(F.col("term") == "late").collect()
    } == {"late": 1}
    meta = idx.corpus_stats(spark).collect()[0]
    assert meta["n_docs"] == 5 and meta["sum_len"] > 0
    got = _scores(idx.search(spark, ["late", "spark"], top_k=10))
    want = _scores(
        bm25_search(
            full.where(F.col("doc_id") <= 4).unionByName(d),
            ["late", "spark"],
            top_k=10,
        )
    )
    assert got == want


def test_vacuum_and_compact_preserve_search(spark, root):
    """Tombstone GC drops only df=0 rows; compact folds commit files
    — neither changes a single search result, and a vacuumed term
    re-inserts cleanly afterward."""
    full = _docs(spark, CORPUS)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.build(full)
    idx.add(_docs(spark, [(3, "replaced entirely")]))  # tombstones 'bm25' etc.
    before = _scores(idx.search(spark, ["spark", "replaced"], top_k=10))
    n_dead = idx.stats.read(spark).where(F.col("df") <= 0).count()
    assert n_dead > 0
    idx.vacuum_tombstones(spark)
    assert idx.stats.read(spark).where(F.col("df") <= 0).count() == 0
    idx.compact(spark)
    assert _scores(idx.search(spark, ["spark", "replaced"], top_k=10)) == before
    # a vacuumed term re-inserts fresh
    idx.add(_docs(spark, [(12, "bm25 comes back")]))
    assert {
        r["term"]: r["df"]
        for r in idx.term_stats(spark).where(F.col("term") == "bm25").collect()
    } == {"bm25": 1}


def test_standing_phrase_matches_one_shot(spark, root):
    """The positional postings answer phrase queries exactly like the
    corpus-scanning twin (textstats.phrase_search) — across an
    update delivery that rewrites a matching doc's text (its match
    must vanish from the standing index)."""
    from batch_processing_on_aws_spark.operators.textstats import (
        phrase_search,
    )

    corpus = CORPUS + [(8, "spark shuffles data again and again")]
    full = _docs(spark, corpus)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.build(full)

    def phrases(q):
        got = sorted(_scores(idx.phrase(spark, q)))
        want = sorted(_scores(phrase_search(current, q)))
        return got, want

    current = full
    for q in (["spark", "shuffles"], ["again", "and", "again"], ["spark"]):
        got, want = phrases(q)
        assert got == want and len(got) > 0, q

    # update: doc 1 loses the phrase
    idx.add(_docs(spark, [(1, "no phrase here")]))
    current = _docs(
        spark,
        [r for r in corpus if r[0] != 1] + [(1, "no phrase here")],
    )
    got, want = phrases(["spark", "shuffles"])
    assert got == want
    assert all(d != 1 for d, _, _ in got)
    # 'no phrase here' is searchable positionally too
    got, want = phrases(["no", "phrase", "here"])
    assert got == want == [(1, 1, 0)]


def test_search_version_pinning(spark, root):
    """Pinning the (postings, stats, meta) triple replays a
    historical search exactly — time travel for the index."""
    full = _docs(spark, CORPUS)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.build(full.where(F.col("doc_id") <= 4))
    v = (
        idx.postings.latest_version(),
        idx.stats.latest_version(),
        idx.meta.latest_version(),
    )
    historical = _scores(idx.search(spark, ["spark"], top_k=5))
    idx.add(_docs(spark, [(11, "spark spark everywhere")]))
    assert _scores(idx.search(spark, ["spark"], top_k=5)) != historical
    assert (
        _scores(idx.search(spark, ["spark"], top_k=5, versions=v))
        == historical
    )


def test_delete_docs_matches_rebuild_of_survivors(spark, root):
    """TRUE removal: delete_docs drops the docs' postings as one
    keyed commit and the pure-delete change feed decrements df and
    N/Σlen through the shared fold — search equals a from-scratch
    index of the surviving corpus."""
    full = _docs(spark, CORPUS)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.build(full.where(F.col("doc_id") <= 4))
    idx.add(full.where(F.col("doc_id") > 4))
    idx.delete_docs(_docs(spark, [(4, "x"), (2, "y")]).select("doc_id"))
    survivors = full.where(~F.col("doc_id").isin(2, 4))
    got = _scores(idx.search(spark, ["spark", "postings"], top_k=5))
    want = _scores(bm25_search(survivors, ["spark", "postings"], top_k=5))
    assert got == want and len(got) > 0
    meta = idx.corpus_stats(spark).collect()[0]
    assert meta["n_docs"] == 5
    # doc 4 held 3 of the 4 'spark' occurrences; df drops 2 -> 1
    df = {r["term"]: r["df"] for r in idx.term_stats(spark).collect()}
    assert df["spark"] == 1
    # 'incrementally' lived only in doc 2: df 0 -> tombstoned (hidden)
    assert "incrementally" not in df


def test_delete_docs_replay_and_absent_ids(spark, root):
    full = _docs(spark, CORPUS)
    idx = TextIndex(root, n_buckets=4, stats_buckets=4)
    idx.build(full)
    txn = {"app": "deld", "epoch": 7}
    idx.delete_docs(_docs(spark, [(1, "")]).select("doc_id"), txn=txn)
    after = _scores(idx.search(spark, ["spark"], top_k=5))
    meta1 = idx.corpus_stats(spark).collect()[0]
    # crash replay of the same epoch: all three sub-stamps minted, so
    # the fold is not re-applied (df would double-decrement otherwise)
    idx.delete_docs(_docs(spark, [(1, "")]).select("doc_id"), txn=txn)
    assert _scores(idx.search(spark, ["spark"], top_k=5)) == after
    meta2 = idx.corpus_stats(spark).collect()[0]
    assert tuple(meta1) == tuple(meta2)
    # absent ids: audited no-op, stats untouched
    idx.delete_docs(_docs(spark, [(999, "")]).select("doc_id"))
    assert tuple(idx.corpus_stats(spark).collect()[0]) == tuple(meta2)
