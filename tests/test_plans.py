"""Physical-plan audits: the properties that make queries survive a
100×–1000× scale-up, asserted on the actual executed plans.

- no BroadcastNestedLoopJoin / CartesianProduct anywhere (a theta or
  null-aware join sneaking in would blow up off small-scale tests) —
  except the brute-force similarity baseline, whose broadcast cross
  product is the documented point of the operator;
- dimension joins resolve to BroadcastHashJoin (tiny dims must never
  shuffle the fact side);
- filters reach the parquet scan (PushedFilters non-empty when the
  query filters a scanned column);
- column pruning reaches the scan (the FileScan column list carries
  only needed columns — a 16-column lineitem scan for a 7-column
  aggregate is a 10× I/O regression at 100 TB).

Plan strings truncate long field lists with '…', so assertions match
prefixes ("PushedFilters: [" + non-]) rather than full bracket bodies.
"""

import re

import pytest

from batch_processing_on_aws_spark.plans.golden import QUERIES

SF_DIR = "/root/testdata/sf0.001"
QMAP = {q.name: q.fn for q in QUERIES}


def _plan(spark, name, materialize=False):
    df = QMAP[name](spark, SF_DIR)
    if materialize:
        df.collect()  # finalize AQE so codegen stages appear
    return df._jdf.queryExecution().executedPlan().toString()


# The ONLY queries allowed to plan a nested-loop/cross join:
# - embedding_topk: the brute-force baseline whose all-pairs scoring IS
#   the semantics (broadcast-built, never a shuffled CartesianProduct);
# - embedding_ivf_topk: the query-probe step crosses the (small by
#   contract) query set with the n_cells-row centroid table — bounded
#   |Q|×16, never touches the corpus side.
# - q22_idle_rich_customers / q11_part_value_concentration /
#   q15_top_supplier: broadcast a ONE-ROW scalar aggregate (global
#   sum/count/max) into the filter — the SQL scalar-subquery pattern;
#   the fact side streams unshuffled.
# - mixture_sampling_plan: broadcasts two ONE-ROW scalars (weight sum,
#   binding min) into the #sources-row summary — same scalar-subquery
#   pattern; the corpus side never crosses anything.
# - corpus_source_drift: broadcasts two ONE-ROW snapshot totals into
#   the #sources-row drift table — same scalar-subquery pattern.
CROSS_PRODUCT_ALLOWED = {
    "embedding_topk",
    "embedding_ivf_topk",
    # brute-force family: query side broadcast, corpus streams (the
    # documented exception; the scale path swaps in LSH/IVF buckets)
    "hard_negative_candidates",
    # scalar normalizers via broadcast crossJoin (TPC-H scalar-subquery
    # pattern, both sides tiny per-source summaries)
    "source_temperature_weights",
    # per-iteration global scalars (node count, dangling mass) ride as
    # broadcast crossJoins — zero driver round-trips in the loop
    "supplier_pagerank",
    "pagerank_skipring_exact",  # same loop, closed-form oracle twin
    # broadcasts the ONE-ROW vocab-size scalar (V in add-one
    # smoothing) into the bigram score stream — scalar-subquery
    # pattern; both count tables join as plain equi-joins
    "doc_bigram_lm_scores",
    # broadcasts the ONE-ROW (N, Σlen) scalar into the term-filtered
    # posting stream — scalar-subquery pattern; postings/df/len join
    # as plain equi-joins
    "bm25_doc_search",
    # broadcasts two ONE-ROW snapshot totals into the #bins-row PSI
    # table — same scalar-subquery pattern as corpus_source_drift
    "doc_length_psi_drift",
    "q22_idle_rich_customers",
    "q11_part_value_concentration",
    "q15_top_supplier",
    "mixture_sampling_plan",
    "corpus_source_drift",
}


def test_no_nested_loop_or_cartesian_anywhere(spark):
    """Sweep EVERY registered query: any nested-loop or cartesian join
    outside the explicit allowlist is a latent 100×-scale blowup (new
    queries are guarded automatically by registering)."""
    offenders = {}
    for name in QMAP:
        if name in CROSS_PRODUCT_ALLOWED:
            continue
        plan = _plan(spark, name)
        bad = [
            op
            for op in ("BroadcastNestedLoopJoin", "CartesianProduct")
            if op in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_brute_force_topk_streams_corpus(spark):
    """The deliberate exception: brute-force top-k broadcasts the
    query set and streams the corpus — the cross product must be
    broadcast-built (never a shuffled CartesianProduct)."""
    plan = _plan(spark, "embedding_topk")
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


@pytest.mark.parametrize(
    "name",
    ["q2_orders_by_region", "top_suppliers_per_nation", "orders_rollup"],
)
def test_dim_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, name
    # the fact table must not be shuffled for a dim join
    assert "SortMergeJoin" not in plan, name


@pytest.mark.parametrize(
    "name",
    ["q4_daily_shipments_1996", "active_customers_semi", "purchase_attribution"],
)
def test_filters_pushed_to_scan(spark, name):
    plan = _plan(spark, name)
    pushed = re.findall(r"PushedFilters: \[(.)", plan)
    assert pushed, f"{name}: no FileScan with PushedFilters"
    assert any(ch != "]" for ch in pushed), f"{name}: all PushedFilters empty"


def test_column_pruning_reaches_scan(spark):
    plan = _plan(spark, "pricing_summary")
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans
    cols = {c.split("#")[0] for c in scans[0].split(",")}
    assert "l_partkey" not in cols and "l_orderkey" not in cols
    assert {"l_quantity", "l_returnflag", "l_linestatus"} <= cols


def test_whole_stage_codegen_active(spark):
    plan = _plan(spark, "pricing_summary", materialize=True)
    # codegen'd stages print as "*(n) Operator" in the final AQE plan
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:500]


def test_span_removal_has_no_window(spark):
    """ExactSubstr removal must pick the globally-first occurrence via
    the hash-aggregate (map-side partial_min of the (doc,pos) struct),
    NEVER a per-hash window — a boilerplate span in millions of docs
    would serialize that window partition on one reducer."""
    plan = _plan(spark, "dedup_spans_removed")
    assert "Window" not in plan
    assert "partial_min" in plan


def test_bigram_rarity_partial_aggregation(spark):
    """The corpus bigram frequency table must build with map-side
    partial counts (the Zipf head collapses before the exchange) and
    plan no window."""
    plan = _plan(spark, "doc_bigram_rarity")
    assert "partial_count" in plan
    assert "Window" not in plan


def _physical(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_quality_logit_is_shuffle_free(spark):
    """The quality-classifier score is a pure projection over the
    Gopher feature scan — at 100 TB it must add ZERO exchanges (a
    map-only pass fused into whatever scan the curation plan does)."""
    plan = _plan(spark, "doc_quality_logit")
    assert "Exchange" not in plan, plan[:400]


def test_training_order_windows_per_shard(spark):
    """The training-order shuffle ranks WITHIN the shard: exactly one
    hash-partitioned exchange on the shard key and no SinglePartition
    global sort (which would serialize the corpus on one reducer)."""
    plan = _plan(spark, "training_shuffle_order")
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning(source") == 1


def test_fan_out_adaptive(spark):
    """``fan_out`` must be a NO-OP on inputs that are already wide —
    at 100 TB the scan itself provides parallelism and an
    unconditional round-robin repartition would move the full document
    text before every text/neardup/similarity operator. Four
    contracts, asserted on physical plans:

    1. single-file dev corpus (1-2 splits): the fan-out repartition
       still happens (the measured 5-13× dev speedup);
    2. caller-pre-partitioned input: NO second exchange is stacked;
    3. many-split scan (simulated with a tiny maxPartitionBytes): no
       round-robin exchange anywhere below the tokenize;
    4. the explicit escape hatches (0 = skip, n = force) are honored.
    """
    from batch_processing_on_aws_spark.operators.neardup import shingle_index
    from batch_processing_on_aws_spark.operators.partitioning import (
        scan_split_estimate,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. narrow dev scan -> fan-out fires
    assert (scan_split_estimate(docs) or 0) < spark.sparkContext.defaultParallelism
    assert "RoundRobinPartitioning" in _physical(shingle_index(docs))

    # 2. caller already partitioned -> exactly the caller's exchange
    pre = docs.repartition(64)
    plan = _physical(shingle_index(pre))
    assert "RoundRobinPartitioning(64" in plan
    assert "RoundRobinPartitioning(32" not in plan

    # 3. wide scan -> NO round-robin exchange below the tokenize
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8k")
    try:
        wide = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        est = scan_split_estimate(wide)
        assert est is not None and est >= spark.sparkContext.defaultParallelism
        assert "RoundRobinPartitioning" not in _physical(shingle_index(wide))
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")

    # 4. explicit escape hatches
    assert "RoundRobinPartitioning" not in _physical(
        shingle_index(docs, partitions=0)
    )
    assert "RoundRobinPartitioning(8" in _physical(shingle_index(docs, partitions=8))
