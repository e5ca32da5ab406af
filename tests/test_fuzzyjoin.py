from pyspark.sql import functions as F  # noqa: F401

from batch_processing_on_aws_spark.operators.fuzzyjoin import (
    fuzzy_pairs,
    qgrams,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_qgrams_short_strings_block_on_themselves(spark):
    got = (
        spark.createDataFrame([("ab",), ("abcd",)], ["s"])
        .select(qgrams(F.col("s"), 3).alias("g"))
        .collect()
    )
    assert got[0]["g"] == ["ab"]
    assert got[1]["g"] == ["abc", "bcd"]


def test_finds_typo_pairs_with_exact_distance(spark):
    df = _names(
        spark,
        [
            (1, "warehouse receiving dock"),
            (2, "warehouse receiving dook"),   # 1 substitution
            (3, "warehouse receiving docks"),  # 1 insertion
            (4, "completely different text"),
        ],
    )
    got = {(r["id_a"], r["id_b"]): r["distance"]
           for r in fuzzy_pairs(df, max_distance=1).collect()}
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 1
    assert (2, 3) not in got  # dook vs docks is distance 2, over the bound
    assert not any(4 in p for p in got)


def test_distance_bound_and_length_band(spark):
    df = _names(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma delta"),  # distance 6 > bound, len band prunes
            (3, "alpha beta gamma!"),       # distance 1
        ],
    )
    got = {(r["id_a"], r["id_b"]) for r in fuzzy_pairs(df, max_distance=1).collect()}
    assert got == {(1, 3)}


def test_exact_duplicates_distance_zero(spark):
    df = _names(spark, [(1, "same name"), (2, "same name")])
    got = fuzzy_pairs(df, max_distance=1).collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in got] == [(1, 2, 0)]


def test_recall_contract_hot_grams_blocked(spark):
    """The documented recall hole: a pair whose EVERY shared q-gram
    exceeds max_df is not discovered — and lowering the cap below the
    population size closes over it deterministically."""
    # 60 ids sharing the prefix 'node-00' + two true near-dups whose
    # only shared grams are that hot prefix
    rows = [(i, f"node-{i:04d}") for i in range(60)]
    df = _names(spark, rows)
    # every 3-gram of 'node-0007' vs 'node-0008' that they share comes
    # from the common prefix, with df ≥ 10
    found = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs(df, max_distance=1, max_df=5).collect()
    }
    assert (7, 8) not in found  # blocked: shared grams are all hot
    relaxed = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs(df, max_distance=1, max_df=100).collect()
    }
    assert (7, 8) in relaxed    # raising the cap restores recall
