"""Unigram-LM tokenizer induction (operators/unigram.py): Viterbi
determinism, EM convergence toward frequent pieces, local vs
distributed twin equivalence, application round-trip, long-word and
coverage fallbacks, rounding convention."""

from batch_processing_on_aws_spark.operators.unigram import (
    _iround,
    _lp_micro,
    _viterbi,
    apply_unigram,
    train_unigram,
    unigram_fertility,
)

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest widest"),
    (4, "widest widest low lower"),
]


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_iround_is_half_away_from_zero():
    assert _iround(2.5) == 3 and _iround(-2.5) == -3
    assert _iround(2.4) == 2 and _iround(-2.4) == -2
    # Python's round() would give 2 and -2 for ±2.5 (banker's)


def test_viterbi_prefers_higher_score_then_fewer_pieces():
    scores = {"a": -10, "b": -10, "ab": -15}
    # 'ab' as one piece: -15 beats a+b = -20
    assert _viterbi("ab", scores, 4) == (-15, ["ab"])
    # equal scores tie-break to FEWER pieces
    scores2 = {"a": -10, "b": -10, "ab": -20}
    assert _viterbi("ab", scores2, 4) == (-20, ["ab"])
    # then to the lexicographically smallest path
    scores3 = {"x": -10, "xx": -20, "xxx": -30}
    score, pieces = _viterbi("xxxx", scores3, 4)
    assert score == -40
    assert pieces == ["x", "xxx"]  # smallest wrapped path among ties


def test_viterbi_respects_max_piece_len_and_coverage():
    scores = {"a": -1, "abcde": -1}
    # max_piece_len=4 forbids the 5-char piece even though it scores
    assert _viterbi("abcde", scores, 4) is None  # b,c,d,e not in model
    assert _viterbi("aaaa", scores, 4) == (-4, ["a", "a", "a", "a"])


def test_trained_model_segments_frequent_substrings(spark):
    vocab = train_unigram(_df(spark))
    rows = {r["piece"]: (r["n_uses"], r["lp_micro"]) for r in vocab.collect()}
    # every character of the corpus is in the model
    for ch in set("".join(w for _, t in CORPUS for w in t.split())):
        assert ch in rows
    # the dominant stems win real usage
    used = {p for p, (n, _) in rows.items() if n > 0}
    assert any(len(p) >= 3 for p in used)  # multi-char pieces survive EM
    # scores are negative micro-nats, integers
    assert all(lp < 0 for _, lp in rows.values())


def test_local_and_distributed_paths_agree(spark):
    df = _df(spark)
    local = {
        (r["piece"], r["n_uses"], r["lp_micro"])
        for r in train_unigram(df).collect()
    }
    dist = {
        (r["piece"], r["n_uses"], r["lp_micro"])
        for r in train_unigram(df, local_histogram_max_words=0).collect()
    }
    assert local == dist


def test_apply_round_trips_characters(spark):
    """Concatenated pieces reproduce each document's lowercased words
    exactly — segmentation never drops or invents characters."""
    df = _df(spark)
    vocab = train_unigram(df)
    out = {r["doc_id"]: r["pieces"] for r in apply_unigram(df, vocab).collect()}
    for doc_id, text in CORPUS:
        assert "".join(out[doc_id]) == text.lower().replace(" ", "")


def test_long_words_pass_through_atomic(spark):
    long_word = "x" * 40
    df = spark.createDataFrame(
        [(1, f"short {long_word} short")], "doc_id long, text string"
    )
    vocab = train_unigram(df, max_word_len=16)
    out = apply_unigram(df, vocab, max_word_len=16).collect()[0]
    assert long_word in out["pieces"]  # atomic, not char-exploded
    # and it contributed nothing to the trained model
    assert all(len(r["piece"]) <= 4 for r in vocab.collect())


def test_fertility_report_shape(spark):
    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in CORPUS],
        "doc_id long, text string, source string",
    )
    vocab = train_unigram(df)
    rows = {r["source"]: r for r in unigram_fertility(df, vocab).collect()}
    assert set(rows) == {"s0", "s1"}
    for r in rows.values():
        # fertility = pieces per word, exactly
        assert abs(r["fertility"] - r["n_pieces"] / r["n_words"]) < 1e-6
        assert r["fertility"] >= 1.0  # a word is at least one piece


def test_training_is_deterministic(spark):
    df = _df(spark)
    a = sorted(map(tuple, train_unigram(df).collect()))
    b = sorted(map(tuple, train_unigram(df).collect()))
    assert a == b


def test_prune_keeps_chars_and_top_multi(spark):
    """target_vocab cuts to size with the SentencePiece rules: every
    single char survives (coverage), multi-char slots go to the
    most-used pieces, and the model renormalizes over the cut."""
    df = _df(spark)
    full = {r["piece"]: r for r in train_unigram(df).collect()}
    target = len([p for p in full if len(p) == 1]) + 3
    pruned = {
        r["piece"]: r
        for r in train_unigram(df, target_vocab=target).collect()
    }
    assert len(pruned) == target
    chars = {p for p in full if len(p) == 1}
    assert chars <= set(pruned)
    kept_multi = {p for p in pruned if len(p) >= 2}
    assert len(kept_multi) == 3
    # survivors are exactly the top-3 multi pieces by final usage
    top3 = sorted(
        ((p, r["n_uses"]) for p, r in full.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:3]
    assert kept_multi == {p for p, _ in top3}
    # the cut renormalized: total usage mass redistributes, chars pick
    # up the segmentation work dropped pieces were doing
    assert sum(r["n_uses"] for r in pruned.values()) >= sum(
        r["n_uses"] for p, r in full.items() if p in pruned
    )


def test_prune_round_trips_and_twin_agrees(spark):
    df = _df(spark)
    target = 30
    vocab = train_unigram(df, target_vocab=target)
    out = {r["doc_id"]: r["pieces"] for r in apply_unigram(df, vocab).collect()}
    for doc_id, text in CORPUS:
        assert "".join(out[doc_id]) == text.lower().replace(" ", "")
    dist = train_unigram(df, target_vocab=target, local_histogram_max_words=0)
    assert sorted(map(tuple, vocab.collect())) == sorted(
        map(tuple, dist.collect())
    )


def test_no_prune_when_target_exceeds_vocab(spark):
    df = _df(spark)
    a = sorted(map(tuple, train_unigram(df).collect()))
    b = sorted(map(tuple, train_unigram(df, target_vocab=10_000).collect()))
    assert a == b


def test_lp_micro_matches_formula():
    import math

    assert _lp_micro(0, 100) == _iround(math.log(1 / 100) * 1e6)
    assert _lp_micro(9, 10) == 0  # ln(10/10) = 0
