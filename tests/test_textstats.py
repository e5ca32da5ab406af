from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.textstats import (
    bpe_ish_token_count,
    fingerprint,
    language_scores,
    text_quality,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "one two  three"), (2, ""), (3, "   "), (4, "single")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "don't stop, 42 times!")], ["doc_id", "text"])
    n = df.select(bpe_ish_token_count(F.col("text")).alias("n")).collect()[0]["n"]
    # don / ' / t / stop / , / 42 / times / !
    assert n == 8


def test_quality_ratios(spark):
    df = spark.createDataFrame([(1, "Ab1!")], ["doc_id", "text"])
    r = text_quality(df).collect()[0]
    assert r["n_chars"] == 4
    assert r["punct_ratio"] == 0.25
    assert r["digit_ratio"] == 0.25
    assert r["upper_ratio"] == 0.25
    assert r["n_tokens"] == 1 and r["mean_token_len"] == 4.0


def test_language_scores_pick_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy in the sun"),
            (2, "le chat est dans la maison et il est content pour le moment"),
            (3, "xyzzy plugh qwerty"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in language_scores(df).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "goodbye")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in fingerprint(df).collect()}
    assert rows[1]["md5"] != rows[2]["md5"]
    assert rows[1]["md5_normalized"] == rows[2]["md5_normalized"]
    assert rows[1]["md5_normalized"] != rows[3]["md5_normalized"]


def test_bigram_rarity_stats(spark):
    """Bigram rarity: positional pair counts, corpus-frequency join,
    every-doc-surfaces contract (short docs get n_bigrams 0)."""
    from batch_processing_on_aws_spark.operators.textstats import (
        bigram_rarity_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat quietly"),   # shares "the cat", "cat sat"
            (3, "zebra"),                 # 1 token -> no bigrams
            (4, ""),                      # empty -> no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_rarity_stats(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_bigrams"] == 5 and out[2]["n_bigrams"] == 3
    assert out[3]["n_bigrams"] == 0 and out[3]["min_bigram_freq"] is None
    assert out[4]["n_bigrams"] == 0 and out[4]["rare_bigram_ratio"] == 0.0
    # "the cat" and "cat sat" occur twice in the corpus; every other
    # bigram once -> doc 2's min freq is 1, and 1/3 of its bigrams are
    # the rare_max_count<=2 boundary... all three are <=2 actually:
    assert out[2]["min_bigram_freq"] == 1
    assert out[2]["rare_bigram_ratio"] == 1.0  # counts 1,2,2 all <= 2
    assert out[1]["min_bigram_freq"] == 1


def test_bigram_lm_scores_match_python_reference(spark):
    """bigram_lm_scores against a from-scratch add-one-smoothed bigram
    LM: exact micro-nat totals per doc, fluent text scoring better
    (lower avg NLL) than the same words shuffled into gibberish, and
    sub-2-token docs surfacing with n_bigrams 0 and NULL scores."""
    import math
    from collections import Counter

    from batch_processing_on_aws_spark.operators.textstats import (
        bigram_lm_scores,
    )

    fluent = "the cat sat on the mat and the cat sat on the rug"
    gibberish = "mat the on rug cat the sat and on the cat mat sat the"
    rows = [
        (1, fluent),
        (2, fluent),            # repetition makes these bigrams common
        (3, gibberish),
        (4, "single"),
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micro"], r["avg_nll"])
        for r in bigram_lm_scores(df).collect()
    }
    # python reference over the same corpus
    docs = {i: (t or "").strip().lower().split() for i, t in rows}
    bigrams = [
        (t[i], t[i + 1])
        for t in docs.values() for i in range(len(t) - 1)
    ]
    c2 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    v = len({w for t in docs.values() for w in t})
    for did, t in docs.items():
        if len(t) < 2:
            assert got[did] == (0, None, None), did
            continue
        nms = [
            round(-math.log((c2[(a, b)] + 1) / (c1[a] + v)) * 1e6)
            for a, b in zip(t, t[1:])
        ]
        want = (len(nms), sum(nms), round(sum(nms) / len(nms) / 1e6, 6))
        assert got[did] == want, did
    # fluency separates: the repeated fluent doc beats the shuffle
    assert got[1][2] < got[3][2]


def test_tfidf_cosine_identical_docs_score_one(spark):
    from batch_processing_on_aws_spark.operators.textstats import (
        tfidf_cosine_pairs,
    )

    rows = [(i, "filler words about nothing %d" % i) for i in range(20)]
    rows += [(100, "rare quantum flux capacitor theory"),
             (101, "rare quantum flux capacitor theory")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = tfidf_cosine_pairs(df, threshold=0.9, max_df=5).collect()
    assert len(got) == 1
    (p,) = got
    assert (p["doc_id_a"], p["doc_id_b"]) == (100, 101)
    # identical weight vectors: cosine is 1.0 up to one sqrt rounding
    assert p["cosine_micro"] >= 999_998


def test_tfidf_cosine_common_term_only_pairs_are_blocked(spark):
    from batch_processing_on_aws_spark.operators.textstats import (
        tfidf_cosine_pairs,
    )

    # every doc shares "the" (df = 8 > max_df = 3); no distinctive
    # term is shared, so no candidate pair may be emitted even at
    # threshold 0
    rows = [(i, "the word%d only" % i) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert tfidf_cosine_pairs(df, threshold=0.0, max_df=3).count() == 0


def test_tfidf_cosine_matches_python_replay(spark):
    import math
    from collections import Counter

    from batch_processing_on_aws_spark.operators.textstats import (
        tfidf_cosine_pairs,
    )

    texts = {
        1: "alpha beta gamma delta alpha",
        2: "alpha beta gamma epsilon zeta",
        3: "unrelated words entirely different tokens",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], ["doc_id", "text"]
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["cosine_micro"]
        for r in tfidf_cosine_pairs(df, threshold=0.0, max_df=50).collect()
    }

    # replay the operator's integer-weight definition in plain python
    tf = {k: Counter(v.lower().split()) for k, v in texts.items()}
    n = len(texts)
    dfreq = Counter(t for c in tf.values() for t in c)
    w = {
        k: {
            t: round(
                (1.0 + math.log(c[t]))
                * math.log((n + 1.0) / (dfreq[t] + 1.0))
                * 1000.0
            )
            for t in c
        }
        for k, c in tf.items()
    }
    w = {k: {t: x for t, x in v.items() if x > 0} for k, v in w.items()}

    def cos_micro(a, b):
        dot = sum(w[a][t] * w[b][t] for t in w[a] if t in w[b])
        na = sum(x * x for x in w[a].values())
        nb = sum(x * x for x in w[b].values())
        return round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1_000_000.0)

    assert got == {(1, 2): cos_micro(1, 2)}, got


def test_phrase_search_consecutive_and_repeated_terms(spark):
    """phrase_search: consecutive-position semantics, repeated terms
    inside the phrase, overlapping matches, 0-based first_pos, and
    no match across a gap."""
    from batch_processing_on_aws_spark.operators.textstats import (
        phrase_search,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "quick brown cow and quick brown fox"),
            (3, "quick crown brown"),          # gap: no match
            (4, "go go go stop"),              # overlapping repeats
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, ["quick", "brown"]).collect()
    }
    assert got == {1: (1, 1), 2: (2, 0)}

    rep = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, ["go", "go"]).collect()
    }
    assert rep == {4: (2, 0)}  # positions 0-1 and 1-2 both match

    tri = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, ["go", "go", "stop"]).collect()
    }
    assert tri == {4: (1, 1)}


def test_phrase_snippets_window_clamps(spark):
    """phrase_snippets: context window clamps at both doc edges,
    snippet is the lowercased rejoined window, n_matches counts
    overlaps, and unmatched/short docs drop."""
    from batch_processing_on_aws_spark.operators.textstats import (
        phrase_snippets,
    )

    df = spark.createDataFrame(
        [
            (1, "Quick Brown fox jumps over the lazy dog"),  # match at 0
            (2, "the very lazy quick brown"),                # match at end
            (3, "quick quick brown brown"),                  # overlap-free 1
            (4, "brown quick"),                              # wrong order
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"], r["snippet"])
        for r in phrase_snippets(df, ["quick", "brown"], context=2).collect()
    }
    assert got == {
        1: (1, 0, "quick brown fox jumps"),        # left edge clamped
        2: (1, 3, "very lazy quick brown"),        # right edge clamped
        3: (1, 1, "quick quick brown brown"),
    }
