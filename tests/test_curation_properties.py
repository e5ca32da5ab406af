"""Property-based tests (hypothesis) for the round-3 curation
operators: invariants that must hold on ARBITRARY text, not just the
fixtures — redaction idempotence/containment, fingerprint permutation
invariance, Gopher flag consistency.

Strategy lists are generated driver-side and shipped through one
createDataFrame per example set (not per example) to keep the suite
fast on a real SparkSession.
"""

import string

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.dedup import bow_fingerprint
from batch_processing_on_aws_spark.operators.pii import PII_PATTERNS, redact_pii
from batch_processing_on_aws_spark.operators.quality import gopher_quality

# printable-ish text including PII-like fragments the generators can
# splice together
_words = st.text(
    alphabet=string.ascii_letters + string.digits + "@.-_ #",
    min_size=0,
    max_size=40,
)
_pii_frags = st.sampled_from(
    [
        "a@b.io",
        "x.y+z@mail.example.org",
        "10.0.0.1",
        "255.255.255.255",
        "123-45-6789",
        "555-123-4567",
        "555.123.4567",
        "not-pii-123",
        "1.2.3",
        "a@b",
    ]
)
_texts = st.lists(
    st.one_of(_words, _pii_frags), min_size=0, max_size=8
).map(lambda parts: " ".join(parts))

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(st.lists(_texts, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_redaction_is_idempotent_and_clean(spark, texts):
    """After one redaction pass, a second pass finds zero matches and
    changes nothing (the placeholder tokens contain no redactable
    spans)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = redact_pii(df).select(
        F.col("doc_id"), F.col("redacted").alias("text")
    )
    twice = redact_pii(once)
    rows = twice.collect()
    first = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for r in rows:
        assert r["n_email"] == r["n_ipv4"] == r["n_ssn"] == r["n_phone"] == 0
        assert r["redacted"] == first[r["doc_id"]]["redacted"]


@given(st.lists(_texts, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_redaction_counts_match_masks(spark, texts):
    """Every counted match disappears from the redacted text: the
    redacted output contains exactly n_<kind> placeholder tokens per
    category (each count is measured on the text AFTER the previous
    categories' masks, so nested spans can't desynchronize them)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    tokens = {"email": "<EMAIL>", "ipv4": "<IP>", "ssn": "<SSN>", "phone": "<PHONE>"}
    for r in redact_pii(df).collect():
        for kind in PII_PATTERNS:
            assert r["redacted"].count(tokens[kind]) == r[f"n_{kind}"], (
                kind,
                r,
            )


@given(st.lists(st.lists(_words, min_size=0, max_size=10), min_size=1, max_size=6),
       st.randoms())
@settings(**_SETTINGS)
def test_bow_fingerprint_permutation_invariant(spark, docs, rnd):
    """Shuffling a document's tokens never changes its bag-of-words
    fingerprint; changing the multiset does (checked via exact token
    lists)."""
    rows = []
    for i, toks in enumerate(docs):
        toks = [t for t in " ".join(toks).split() if t]
        shuffled = list(toks)
        rnd.shuffle(shuffled)
        rows.append((i, " ".join(toks), " ".join(shuffled)))
    df = spark.createDataFrame(rows, "i long, orig string, shuf string")
    out = df.select(
        "i",
        bow_fingerprint(F.col("orig")).alias("f1"),
        bow_fingerprint(F.col("shuf")).alias("f2"),
    ).collect()
    for r in out:
        assert r["f1"] == r["f2"]


@given(st.lists(_texts, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_gopher_keep_equals_flag_conjunction(spark, texts):
    """`keep` is exactly the AND of the five rule flags, and every
    ratio sits in [0, 1] with word_count consistent."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in gopher_quality(df).collect():
        flags = [
            r["flag_word_count"],
            r["flag_mean_word_len"],
            r["flag_symbol_ratio"],
            r["flag_alpha_ratio"],
            r["flag_stopwords"],
        ]
        assert r["keep"] == all(flags)
        assert 0.0 <= r["alpha_word_ratio"] <= 1.0
        assert r["symbol_word_ratio"] >= 0.0
        assert r["word_count"] >= 0
        assert (r["word_count"] == 0) == (r["mean_word_len"] == 0.0) or r[
            "mean_word_len"
        ] > 0


# tiny vocabulary so phrases repeat and overlap often
_pwords = st.sampled_from(["a", "b", "c", "ab"])
_pdocs = st.lists(
    st.lists(_pwords, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)
_pphrase = st.lists(_pwords, min_size=1, max_size=3)


@given(_pdocs, _pphrase)
@settings(**_SETTINGS)
def test_phrase_search_matches_python_reference(spark, texts, phrase):
    """phrase_search == a straight Python scan over the tokenized
    docs: same matching docs, same match counts, same 0-based first
    position — under repeated terms, overlaps, and empty docs."""
    from batch_processing_on_aws_spark.operators.textstats import (
        phrase_search,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, phrase).collect()
    }
    want = {}
    k = len(phrase)
    for i, text in enumerate(texts):
        toks = text.lower().split()
        hits = [
            p
            for p in range(len(toks) - k + 1)
            if toks[p : p + k] == list(phrase)
        ]
        if hits:
            want[i] = (len(hits), hits[0])
    assert got == want
