"""Exact substring (token-window) dedup: positional spans, occurrence
flagging, per-doc duplicated-span share. Brute-force cross-checked on
a corpus with planted repeats, within-doc and cross-doc."""

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.neardup import (
    dup_span_share,
    duplicate_spans,
    span_windows,
)


@pytest.fixture()
def corpus(spark):
    boiler = "the quick brown fox jumps over the lazy dog again and again"  # 12 toks
    rows = [
        # doc 1 and 2 share the boilerplate prefix (cross-doc dup)
        (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, boiler + " one two three four five six seven eight"),
        # doc 3 repeats its own first 12 tokens (within-doc dup)
        (3, boiler + " " + boiler),
        # doc 4: 20 distinct words, long enough to emit spans but
        # with no repeated window anywhere
        (4, " ".join(f"w{i}" for i in range(20))),
        # doc 5: shorter than the window -> no spans at all
        (5, "too short to matter"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_windows_positional_and_guarded(corpus):
    w = span_windows(corpus, window=12)
    per_doc = {r["doc_id"]: r["n"] for r in w.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    # k tokens -> k - window + 1 positional spans
    assert per_doc[1] == 20 - 12 + 1
    assert per_doc[3] == 24 - 12 + 1
    assert 5 not in per_doc  # shorter than window: nothing, not negative-sequence junk
    # positions are 0-based offsets
    pos = sorted(r["pos"] for r in w.where("doc_id = 1").collect())
    assert pos == list(range(9))


def test_duplicate_spans_flags_cross_and_within_doc(corpus):
    dup = duplicate_spans(corpus, window=12)
    rows = dup.collect()
    docs = {r["doc_id"] for r in rows}
    assert {1, 2, 3} <= docs and 4 not in docs and 5 not in docs
    # the shared boilerplate span occurs at pos 0 of docs 1, 2, 3 AND
    # again at pos 12 of doc 3 (its second half): occurrence counts on
    # the boiler-prefix hash must agree
    at0 = [r for r in rows if r["pos"] == 0]
    assert {r["doc_id"] for r in at0} == {1, 2, 3}
    assert all(r["n_occurrences"] == 4 for r in at0)
    assert any(r["doc_id"] == 3 and r["pos"] == 12 for r in rows)


def test_dup_span_share_ratio(corpus):
    share = {r["doc_id"]: r for r in dup_span_share(corpus, window=12).collect()}
    assert share[4]["n_dup_spans"] == 0 and share[4]["dup_share"] == 0.0
    assert 5 not in share  # undefined, not zero
    # doc 1: only the pos-0 boilerplate span is shared
    assert share[1]["n_spans"] == 9 and share[1]["n_dup_spans"] == 1
    assert share[1]["dup_share"] == pytest.approx(1 / 9)
    # doc 3's self-repeat: pos 0 and pos 13 both duplicated
    assert share[3]["n_dup_spans"] >= 2


def test_brute_force_equivalence(spark, corpus):
    """Every flagged occurrence is a real repeat of the exact token
    window, and nothing real is missed — checked by recomputing span
    texts driver-side."""
    window = 12
    texts = {r["doc_id"]: r["text"].split() for r in corpus.collect()}
    from collections import Counter

    spans = {}
    for d, toks in texts.items():
        for i in range(max(0, len(toks) - window + 1)):
            spans[(d, i)] = " ".join(toks[i : i + window])
    counts = Counter(spans.values())
    expected = {(d, i) for (d, i), s in spans.items() if counts[s] >= 2}
    got = {(r["doc_id"], r["pos"]) for r in duplicate_spans(corpus, window=window).collect()}
    assert got == expected


def test_remove_duplicate_spans_keep_first(spark, corpus):
    """Keep-first removal: the globally-first occurrence survives,
    later occurrences are excised; untouched docs round-trip their
    tokenized text; short docs pass through whole."""
    from batch_processing_on_aws_spark.operators.neardup import (
        remove_duplicate_spans,
    )

    out = {r["doc_id"]: r for r in remove_duplicate_spans(corpus, window=12).collect()}
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert set(out) == set(texts)
    # doc 1 holds the globally-first boiler occurrence: nothing removed
    assert out[1]["text"] == texts[1] and out[1]["n_tokens_removed"] == 0
    # docs 2/3: the boiler window (and its overlaps) cut from later copies
    assert out[2]["n_tokens_removed"] > 0
    assert "quick brown fox" not in out[2]["text"]
    assert "one two three" in out[2]["text"]  # unique tail survives
    # doc 3's second boiler half is a later occurrence of the same spans
    assert out[3]["n_tokens_removed"] > 0
    # unaffected and short docs round-trip
    assert out[4]["text"] == texts[4] and out[4]["n_tokens_removed"] == 0
    assert out[5]["text"] == texts[5] and out[5]["n_tokens_removed"] == 0


def test_remove_duplicate_spans_remove_all(spark, corpus):
    """keep_first=False cuts EVERY occurrence (the reference
    ExactSubstr tool behavior): no copy of the boilerplate survives
    anywhere, and strictly more tokens go than in keep-first mode."""
    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.neardup import (
        remove_duplicate_spans,
    )

    keep = remove_duplicate_spans(corpus, window=12, keep_first=True)
    cut_all = remove_duplicate_spans(corpus, window=12, keep_first=False)
    assert not any(
        "quick brown fox" in r["text"] for r in cut_all.collect()
    )
    n_keep = keep.agg(F.sum("n_tokens_removed")).collect()[0][0]
    n_all = cut_all.agg(F.sum("n_tokens_removed")).collect()[0][0]
    assert n_all > n_keep


def test_remove_duplicate_spans_property(spark):
    """Property (hypothesis): on corpora built from a 3-word alphabet
    (maximizing window collisions), keep-first removal matches a
    driver-side brute-force reimplementation exactly — text, removal
    counts, and doc set."""
    import string

    from hypothesis import HealthCheck, given, settings, strategies as st

    from batch_processing_on_aws_spark.operators.neardup import (
        remove_duplicate_spans,
    )

    window = 4
    _doc = st.lists(
        st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
    ).map(" ".join)
    _corpus = st.lists(_doc, min_size=1, max_size=5)

    def brute(texts):
        toks = {i: t.split() for i, t in enumerate(texts)}
        from collections import Counter

        spans = {
            (d, p): " ".join(ts[p : p + window])
            for d, ts in toks.items()
            for p in range(len(ts) - window + 1)
        }
        counts = Counter(spans.values())
        first = {}
        for (d, p) in sorted(spans):
            first.setdefault(spans[(d, p)], (d, p))
        cut = {
            d: {
                q
                for (dd, p), s in spans.items()
                if dd == d and counts[s] >= 2 and first[s] != (dd, p)
                for q in range(p, p + window)
            }
            for d in toks
        }
        return {
            d: (
                " ".join(t for i, t in enumerate(ts) if i not in cut[d]),
                len(cut[d] & set(range(len(ts)))),
            )
            for d, ts in toks.items()
        }

    @given(_corpus)
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["text"], r["n_tokens_removed"])
            for r in remove_duplicate_spans(df, window=window).collect()
        }
        assert got == brute(texts)

    check()


def test_remove_spans_against_ledger(spark, corpus):
    """Incremental ExactSubstr: ledger passages are excised from the
    batch wholesale (no keep-first exemption — the corpus already has
    them); within-batch repeats keep their first occurrence; the
    returned delta holds only hashes the ledger lacked."""
    from batch_processing_on_aws_spark.operators.neardup import (
        remove_spans_against_ledger,
        span_windows,
    )

    prior = corpus.where("doc_id = 1")          # owns the boilerplate
    batch = corpus.where("doc_id in (2, 3, 4)")
    ledger = span_windows(prior, window=12).select("span_hash")
    cleaned, delta = remove_spans_against_ledger(batch, ledger, window=12)
    out = {r["doc_id"]: r for r in cleaned.collect()}
    # doc 2's boiler prefix is in the ledger -> cut, even though it
    # would be the batch's first occurrence
    assert "quick brown fox" not in out[2]["text"]
    assert "one two three" in out[2]["text"]
    # doc 3 = boiler twice: both copies covered by ledger hashes
    assert out[3]["n_tokens_removed"] > 12
    # doc 4 untouched
    assert out[4]["n_tokens_removed"] == 0
    # the delta excludes every ledger hash
    ledger_hashes = {r["span_hash"] for r in ledger.distinct().collect()}
    delta_hashes = {r["span_hash"] for r in delta.collect()}
    assert not (delta_hashes & ledger_hashes)
    # feeding the batch back against ledger+delta cuts everything dup:
    merged = ledger.unionByName(delta)
    cleaned2, delta2 = remove_spans_against_ledger(batch, merged, window=12)
    assert delta2.count() == 0


def test_winnowing_guarantee_and_compression(spark):
    """MOSS winnowing property: any shared passage of at least
    window + winnow - 1 tokens yields a shared fingerprint, and the
    fingerprint set is materially smaller than the full span stream."""
    import random

    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.neardup import (
        span_windows,
        winnowed_fingerprints,
    )

    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(200)]
    shared = " ".join(rng.choice(vocab) for _ in range(7))  # 7 = 4+4-1
    def noise(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    docs = spark.createDataFrame(
        [
            (1, noise(30) + " " + shared + " " + noise(30)),
            (2, noise(25) + " " + shared + " " + noise(40)),
            (3, noise(60)),
        ],
        "doc_id long, text string",
    )
    fp = winnowed_fingerprints(docs, window=4, winnow=4)
    by_doc = {
        d: {r["fingerprint"] for r in rows}
        for d, rows in (
            (d, fp.where(F.col("doc_id") == d).collect()) for d in (1, 2, 3)
        )
    }
    assert by_doc[1] & by_doc[2], "shared >= w+k-1 passage must collide"
    # compression: winnowed set ≪ positional span stream
    n_spans = span_windows(docs, window=4).count()
    n_fp = fp.count()
    assert n_fp < 0.6 * n_spans


def test_remove_contaminated_spans_cuts_only_benchmark_text(spark):
    """Span-level decontamination: benchmark passages are excised from
    corpus docs; corpus-internal repetition is deliberately untouched
    (within_batch=False), and docs with no overlap pass through
    verbatim (space-normalized)."""
    from batch_processing_on_aws_spark.operators.decontam import (
        remove_contaminated_spans,
    )

    leak = " ".join(f"b{i}" for i in range(6))  # a 6-token benchmark passage
    rep = "r1 r2 r3 r4 r5 r6"                   # corpus-internal repeat
    corpus = spark.createDataFrame(
        [
            (1, f"intro words here {leak} outro tail words"),
            (2, f"{rep} middle {rep} end filler tokens"),
            (3, "fully clean document with its own tokens only"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame([(leak,)], "text string")
    out = {
        r["doc_id"]: r
        for r in remove_contaminated_spans(
            corpus, benchmark, window=6
        ).collect()
    }
    # every input doc survives with a row
    assert set(out) == {1, 2, 3}
    # the leaked passage is gone from doc 1; its own words survive
    assert all(f"b{i}" not in out[1]["text"] for i in range(6))
    assert "intro" in out[1]["text"] and "outro" in out[1]["text"]
    assert out[1]["n_tokens_removed"] >= 6
    # corpus-internal repetition NOT cut (not the benchmark's business)
    assert out[2]["text"].count("r1") == 2
    assert out[2]["n_tokens_removed"] == 0
    # clean doc passes through verbatim
    assert out[3]["text"] == "fully clean document with its own tokens only"
    assert out[3]["n_tokens_removed"] == 0
