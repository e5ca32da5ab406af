"""WordPiece tokenizer induction (operators/wordpiece.py): the
likelihood-scored merge trainer vs a from-scratch reference, the
local/distributed twin contract, replay application round-trip, and
the greedy BERT-runtime tokenizer's own properties (longest match,
whole-word [UNK], OOV handling)."""

import pytest
from pyspark.sql import functions as F


def _ref_wordpiece(word_counts, n_merges, min_pair_count=2):
    """Reference WordPiece trainer (Schuster & Nakajima 2012 scoring:
    count(l,r)/(count(l)·count(r)); BERT's ## continuation prefix),
    plain Python, with the engine's (left asc, right asc) tie-break."""
    vocab = {}
    for w, c in word_counts.items():
        syms = tuple([w[0]] + ["##" + ch for ch in w[1:]])
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(n_merges):
        pc, sc = {}, {}
        for syms, c in vocab.items():
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                pc[pair] = pc.get(pair, 0) + c
        cands = [
            (-(cnt / (sc[l] * sc[r])), l, r, cnt, sc[l], sc[r])
            for (l, r), cnt in pc.items()
            if cnt >= min_pair_count
        ]
        if not cands:
            break
        _, left, right, cnt, lc, rc = min(cands)
        merged = left + (right[2:] if right.startswith("##") else right)
        merges.append((left, right, merged, cnt, lc, rc))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest widest"),
    (4, "widest widest low lower quest"),
    (5, "quest question questions quiz"),
]


def _counts():
    wc = {}
    for _, text in CORPUS:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_learn_wordpiece_matches_reference(spark):
    from batch_processing_on_aws_spark.operators.wordpiece import (
        learn_wordpiece,
    )

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = [
        (
            r["left"], r["right"], r["merged"], r["pair_count"],
            r["left_count"], r["right_count"],
        )
        for r in learn_wordpiece(df, n_merges=10).orderBy("rank").collect()
    ]
    want = _ref_wordpiece(_counts(), 10)
    assert got == want
    assert len(got) >= 5


def test_score_beats_raw_frequency(spark):
    """The family-defining behavior: 'q'+'##u' (every q is followed
    by u — association 1-ish) merges BEFORE high-frequency but
    weakly-associated pairs that raw-count BPE would pick first."""
    from batch_processing_on_aws_spark.operators.bpe import learn_bpe
    from batch_processing_on_aws_spark.operators.wordpiece import (
        learn_wordpiece,
    )

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wp_first = [
        (r["left"], r["right"])
        for r in learn_wordpiece(df, n_merges=3).orderBy("rank").collect()
    ]
    assert ("q", "##u") in wp_first
    bpe_first = [
        (r["left"], r["right"])
        for r in learn_bpe(df, n_merges=3).orderBy("rank").collect()
    ]
    assert ("q", "u") not in bpe_first  # raw frequency orders differently


def test_local_and_distributed_paths_agree(spark):
    from batch_processing_on_aws_spark.operators.wordpiece import (
        learn_wordpiece,
    )

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    local = [
        tuple(r)
        for r in learn_wordpiece(df, n_merges=10).orderBy("rank").collect()
    ]
    dist = [
        tuple(r)
        for r in learn_wordpiece(
            df, n_merges=10, local_histogram_max_words=0
        )
        .orderBy("rank")
        .collect()
    ]
    assert local == dist


def test_apply_round_trip_and_prefixes(spark):
    """Replay segmentation: pieces reassemble the word (first piece
    plain, continuations ##-prefixed), and fully-merged words
    compress to fewer pieces than characters."""
    from batch_processing_on_aws_spark.operators.wordpiece import (
        apply_wordpiece, learn_wordpiece,
    )

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = learn_wordpiece(df, n_merges=10)
    out = apply_wordpiece(df, merges).collect()
    for row in out:
        text = dict(CORPUS)[row["doc_id"]]
        words = text.lower().split()
        pieces = list(row["pieces"])
        assert row["n_pieces"] == len(pieces)
        # reassemble: a plain piece starts a word, ## continues it
        rebuilt = []
        for p in pieces:
            if p.startswith("##"):
                rebuilt[-1] += p[2:]
            else:
                rebuilt.append(p)
        assert rebuilt == words
        assert len(pieces) < sum(len(w) for w in words)  # learned structure


def test_greedy_longest_match_unk_and_oov(spark):
    from batch_processing_on_aws_spark.operators.wordpiece import (
        wordpiece_greedy,
    )

    vocab = {"un", "##able", "##a", "u", "##n", "quest", "##ion", "q"}
    df = spark.createDataFrame(
        [
            (1, "unable"),       # longest-first: un + ##able, not u/##n/##a...
            (2, "question"),     # quest + ##ion
            (3, "zzz"),          # no vocab coverage -> whole-word UNK
            (4, "questionzzz"),  # matches a prefix, then dead-ends -> UNK
            (5, ""),             # empty text -> zero pieces
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in wordpiece_greedy(df, vocab).collect()
    }
    assert got[1] == ["un", "##able"]
    assert got[2] == ["quest", "##ion"]
    assert got[3] == ["[UNK]"]
    assert got[4] == ["[UNK]"]
    assert got[5] == []


def test_unk_stats_match_greedy(spark):
    """The reduction behind ``wordpiece_unk_stats``: with the
    alphabet-closed ``wordpiece_vocab``, greedy longest-match UNKs a
    word IFF the position-sensitive character-coverage test fails —
    so the SQL-replayable report counts exactly the greedy
    tokenizer's [UNK] words."""
    from batch_processing_on_aws_spark.operators.wordpiece import (
        learn_wordpiece, wordpiece_greedy, wordpiece_unk_stats,
        wordpiece_vocab,
    )

    train = spark.createDataFrame(CORPUS, "doc_id long, text string")
    probe = spark.createDataFrame(
        [
            (1, "src_a", "low nest zebra"),  # covered, alphabet-OOV 'z'
            (2, "src_a", "quiz quix 9lo"),   # covered, x-cont OOV, 9-first OOV
            (3, "src_b", "widest"),          # fully covered
            (4, "src_b", ""),                # no words
        ],
        "doc_id long, source string, text string",
    )
    stats = {
        r["source"]: (r["n_words"], r["n_unk_words"])
        for r in wordpiece_unk_stats(probe, train).collect()
    }
    merges = learn_wordpiece(train, n_merges=10)
    vocab = wordpiece_vocab(train, merges)
    greedy = wordpiece_greedy(probe, vocab)
    g = (
        probe.join(greedy.select("doc_id", "pieces"), "doc_id")
        .where(F.length(F.trim("text")) > 0)
        .select(
            "source",
            F.size(F.split(F.trim("text"), r"\s+")).alias("nw"),
            F.size(F.filter("pieces", lambda p: p == "[UNK]")).alias("nu"),
        )
        .groupBy("source")
        .agg(
            F.sum("nw").cast("long").alias("n_words"),
            F.sum("nu").cast("long").alias("n_unk"),
        )
    )
    want = {r["source"]: (r["n_words"], r["n_unk"]) for r in g.collect()}
    assert stats == want
    assert stats["src_a"][1] >= 3  # zebra, quix, 9lo all UNK


def test_greedy_with_full_vocab_handles_oov(spark):
    """``wordpiece_vocab`` seeds the training ALPHABET (first-position
    and ## forms) plus merged symbols, so an unseen word made of seen
    characters segments (into characters at worst) and only
    alphabet-missing words go UNK — the BERT runtime contract."""
    from batch_processing_on_aws_spark.operators.wordpiece import (
        learn_wordpiece, wordpiece_greedy, wordpiece_vocab,
    )

    train = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = learn_wordpiece(train, n_merges=10)
    vocab = wordpiece_vocab(train, merges)
    probe = spark.createDataFrame(
        # "nest": unseen word, but 'n' is a seen FIRST-position char
        # and e/s/t seen continuations (alphabet forms are
        # position-sensitive — no training word starts with 's', so
        # "slow" would honestly UNK, as BERT's vocab would)
        [(1, "nest"), (2, "x9!"), (3, "widest")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in wordpiece_greedy(probe, vocab).collect()
    }
    # OOV word over the seen alphabet: segments and reassembles
    assert got[1] != ["[UNK]"]
    rebuilt = "".join(p[2:] if p.startswith("##") else p for p in got[1])
    assert rebuilt == "nest"
    assert got[2] == ["[UNK]"]  # x, 9, ! not in the training alphabet
    # trained word: merged symbols make it compress below char count
    assert len(got[3]) < len("widest")
