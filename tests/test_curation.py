"""Unit tests for the round-2 curation operators: decontamination,
sequence packing, stratified sampling, repetition stats, and token
heavy-hitters."""

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.decontam import contamination_report
from batch_processing_on_aws_spark.operators.packing import pack_sequences
from batch_processing_on_aws_spark.operators.sampling import (
    hash_bucket,
    stratified_hash_sample,
)
from batch_processing_on_aws_spark.operators.textstats import (
    repetition_stats,
    token_frequencies,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestContamination:
    def test_verbatim_inclusion_has_containment_one(self, spark):
        corpus = _docs(
            spark,
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "totally unrelated words here now friend"),
            ],
        )
        bench = _docs(spark, [(100, "alpha beta gamma delta")])
        out = contamination_report(corpus, bench, shingle_n=3).collect()
        assert len(out) == 1
        row = out[0]
        assert (row.corpus_doc_id, row.bench_doc_id) == (1, 100)
        # bench doc has 2 distinct 3-grams, both inside corpus doc 1
        assert row.n_overlap == 2
        assert row.containment == 1.0

    def test_min_overlap_filters(self, spark):
        corpus = _docs(spark, [(1, "alpha beta gamma x y z")])
        bench = _docs(spark, [(100, "alpha beta gamma q r s")])
        # exactly one shared 3-gram ("alpha beta gamma")
        assert (
            contamination_report(corpus, bench, shingle_n=3, min_overlap=1).count()
            == 1
        )
        assert (
            contamination_report(corpus, bench, shingle_n=3, min_overlap=2).count()
            == 0
        )

    def test_clean_corpus_reports_nothing(self, spark):
        corpus = _docs(spark, [(1, "one two three four five")])
        bench = _docs(spark, [(100, "six seven eight nine ten")])
        assert contamination_report(corpus, bench, shingle_n=3).count() == 0


class TestPacking:
    def _frame(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, shard string, n_tokens long"
        )

    def test_contiguous_layout(self, spark):
        df = self._frame(
            spark,
            [(1, "a", 60), (2, "a", 60), (3, "a", 60), (4, "a", 20)],
        )
        out = {
            r.doc_id: (r.seq_no, r.seq_offset)
            for r in pack_sequences(
                df, "n_tokens", 100, order_col="doc_id", shard_col="shard"
            ).collect()
        }
        # cumulative starts: 0, 60, 120, 180
        assert out == {1: (0, 0), 2: (0, 60), 3: (1, 20), 4: (1, 80)}

    def test_exact_fill_starts_next_sequence(self, spark):
        df = self._frame(spark, [(1, "a", 100), (2, "a", 1)])
        out = {
            r.doc_id: (r.seq_no, r.seq_offset)
            for r in pack_sequences(
                df, "n_tokens", 100, order_col="doc_id", shard_col="shard"
            ).collect()
        }
        assert out == {1: (0, 0), 2: (1, 0)}

    def test_shards_pack_independently(self, spark):
        df = self._frame(spark, [(1, "a", 70), (2, "b", 70), (3, "a", 70)])
        out = {
            (r.shard, r.doc_id): (r.seq_no, r.seq_offset)
            for r in pack_sequences(
                df, "n_tokens", 100, order_col="doc_id", shard_col="shard"
            ).collect()
        }
        assert out[("b", 2)] == (0, 0)  # shard b restarts at zero
        assert out[("a", 3)] == (0, 70)  # b's tokens don't leak into a

    def test_global_pack_without_shard(self, spark):
        df = self._frame(spark, [(1, "a", 70), (2, "b", 70)])
        out = {
            r.doc_id: r.seq_no
            for r in pack_sequences(
                df, "n_tokens", 100, order_col="doc_id"
            ).collect()
        }
        assert out == {1: 0, 2: 0}

    def test_rejects_bad_budget(self, spark):
        df = self._frame(spark, [(1, "a", 1)])
        with pytest.raises(ValueError, match="budget"):
            pack_sequences(df, "n_tokens", 0, order_col="doc_id")


class TestStratifiedSample:
    def test_rates_respected_exactly(self, spark):
        df = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "fr") for i in range(400)],
            "doc_id long, lang string",
        )
        out = stratified_hash_sample(
            df, key="doc_id", group_col="lang", rates_pct={"en": 10},
            default_pct=100,
        )
        # every non-en row survives (rate 100); en rows are the
        # deterministic bucket<10 subset
        expected_en = df.where(
            (F.col("lang") == "en") & (hash_bucket(F.col("doc_id")) < 10)
        ).count()
        by_lang = {r.lang: r.c for r in out.groupBy("lang").agg(
            F.count(F.lit(1)).alias("c")).collect()}
        assert by_lang["fr"] == 200
        assert by_lang.get("en", 0) == expected_en

    def test_deterministic_across_runs(self, spark):
        df = spark.createDataFrame(
            [(i, "x") for i in range(100)], "doc_id long, lang string"
        )
        a = {
            r.doc_id
            for r in stratified_hash_sample(
                df, "doc_id", "lang", {"x": 37}
            ).collect()
        }
        b = {
            r.doc_id
            for r in stratified_hash_sample(
                df, "doc_id", "lang", {"x": 37}
            ).collect()
        }
        assert a == b and 0 < len(a) < 100


class TestRepetitionStats:
    def test_fully_repeated_doc(self, spark):
        df = _docs(spark, [(1, "a a a a")])
        row = repetition_stats(df, n=2).collect()[0]
        # 2-gram stream: "a a" ×3
        assert (row.total_grams, row.distinct_grams) == (3, 1)
        assert row.dup_gram_ratio == pytest.approx(2 / 3, abs=1e-6)
        assert row.top_gram_share == 1.0

    def test_all_distinct_doc(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        row = repetition_stats(df, n=2).collect()[0]
        assert (row.total_grams, row.distinct_grams) == (3, 3)
        assert row.dup_gram_ratio == 0.0

    def test_short_and_empty_docs_survive(self, spark):
        df = _docs(spark, [(1, "only"), (2, "")])
        rows = {r.doc_id: r for r in repetition_stats(df, n=2).collect()}
        assert rows[1].total_grams == 1  # whole doc as one gram
        assert rows[2].dup_gram_ratio == 0.0


class TestTokenFrequencies:
    def test_counts_and_deterministic_order(self, spark):
        df = _docs(spark, [(1, "b a a"), (2, "B c a")])
        rows = token_frequencies(df, k=2).collect()
        # 'a' ×3, then tie b/c broken alphabetically → 'b' ×2
        assert [(r.token, r.occurrences) for r in rows] == [("a", 3), ("b", 2)]


# ---------------------------------------------------------------------------
# Property tests (hypothesis): packing invariants and decontamination
# vs a brute-force set-intersection reference
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=25),
    budget=st.integers(min_value=1, max_value=200),
)
def test_packing_matches_serial_cumsum(spark, sizes, budget):
    """For any doc sizes and budget, the packed layout equals the
    serial running-sum reference: offsets < budget, seq_no monotone
    non-decreasing in layout order."""
    df = spark.createDataFrame(
        [(i, int(s)) for i, s in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    from batch_processing_on_aws_spark.operators.packing import pack_sequences

    got = {
        r.doc_id: (r.seq_no, r.seq_offset)
        for r in pack_sequences(df, "n_tokens", budget, order_col="doc_id").collect()
    }
    start = 0
    for i, s in enumerate(sizes):
        assert got[i] == (start // budget, start % budget)
        assert 0 <= got[i][1] < budget
        start += s


_word = st.sampled_from(["w0", "w1", "w2", "w3", "w4"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(_text, min_size=1, max_size=6),
    bench=st.lists(_text, min_size=1, max_size=3),
)
def test_contamination_matches_bruteforce(spark, corpus, bench):
    """contamination_report == brute-force shingle-set intersection
    for arbitrary texts (incl. empty/short docs)."""
    from batch_processing_on_aws_spark.operators.decontam import (
        contamination_report,
    )

    def sh(text, n=3):
        toks = text.split() if text.strip() else []
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    cdf = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = {
        (r.corpus_doc_id, r.bench_doc_id): r.n_overlap
        for r in contamination_report(cdf, bdf, shingle_n=3).collect()
    }
    want = {}
    for ci, ct in enumerate(corpus):
        for bi, bt in enumerate(bench):
            n = len(sh(ct) & sh(bt))
            if n >= 1:
                want[(ci, 100 + bi)] = n
    assert got == want
