"""The rest of the TPC-H query-shape enumeration (Q6-Q13, Q15, Q17,
Q19-Q21), adapted to the synthetic star schema.

Together with Q1/Q3/Q4/Q5/Q14/Q16/Q18/Q22 elsewhere (plans/tpch.py,
plans/dashboard.py, plans/golden.py) this completes 21 of the 22
classic shapes — everything except Q2, whose min-cost-supplier
correlated subquery needs the partsupp table this schema doesn't have.
Queries needing absent columns are adapted shape-for-shape and say so
in their docstring (no partsupp → Q9/Q11/Q20 use the lineitem link as
the part-supplier association; no l_shipmode/l_commitdate/
l_receiptdate → Q12/Q21 define lateness from l_shipdate vs
o_orderdate).

Scale notes common to all of these: dimension sides (part, supplier,
nation, customer where filtered) are explicitly broadcast; fact-fact
joins shuffle on their keys and carry only post-filter rows (predicates
sit before the join so they push into the parquet scan); every sum
feeding a comparison or a published number is decimal-exact and only
the finished value is cast to double (see tpch.money_sum for why).
Group-by keys are all low-cardinality (nation, year, brand, bucket), so
partial aggregation collapses map-side and the shuffles move KBs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .tpch import money_sum


def q6_forecast_revenue(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan filtered aggregate. All three
    predicates push into the parquet reader (range on l_shipdate,
    band on l_discount, bound on l_quantity); the aggregate is one
    decimal-exact sum, so the whole query is a pruned scan plus a
    1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue_delta"
        )
    )


_Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))), 2)
            AS DOUBLE) AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q7_nation_trade_flows(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation → customer-nation revenue flows
    by ship year. Two aliased copies of the 25-row nation dim are
    broadcast; the only shuffles are the lineitem⋈orders and ⋈customer
    key joins plus the final ≤(25·24·2)-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("trade_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS trade_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q8_market_share(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one
    part type, by order year. Numerator and denominator are summed
    decimal-exact in the SAME aggregate pass, rounded to cents, cast
    to double, and only then divided — so the share is a ratio of two
    bit-identical doubles in both engines (same trick as Q14)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # customer nations restricted to the ASIA region (two tiny dims
    # folded before broadcast)
    cust_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(30,6)")
    )
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("mkt_year"))
        .agg(
            F.round(F.sum(target), 2).cast("double").alias("nation_revenue"),
            F.round(F.sum(vol), 2).cast("double").alias("market_revenue"),
        )
    )
    return agg.select(
        "mkt_year",
        "nation_revenue",
        "market_revenue",
        F.round(F.col("nation_revenue") / F.col("market_revenue"), 6).alias(
            "market_share"
        ),
    )


_Q8_SQL = """
WITH agg AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS mkt_year,
         CAST(ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
                             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                             ELSE CAST(0 AS DECIMAL(30,6)) END), 2) AS DOUBLE)
           AS nation_revenue,
         CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2)
              AS DOUBLE) AS market_revenue
  FROM lineitem
  JOIN part     ON l_partkey  = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey  = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  GROUP BY 1
)
SELECT mkt_year, nation_revenue, market_revenue,
       ROUND(nation_revenue / market_revenue, 6) AS market_share
FROM agg
"""


def q9_part_type_profit(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: revenue by supplier nation × order year for
    parts whose name contains a word. Adapted: this schema has no
    partsupp, so profit omits the ps_supplycost·l_quantity term and is
    plain discounted revenue; the join/aggregate shape (fact ⋈ two
    broadcast dims ⋈ orders, two-key group) is Q9's."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("red")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("profit")
        )
    )


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2)
            AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q10_returned_items(spark, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returns in
    one quarter. Ties on revenue are broken by c_custkey so the top-k
    edge is deterministic in both engines. The c_acctbal passthrough
    is untouched double (no arithmetic → no representation drift)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("lost_revenue")
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name AS nation,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2)
            AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


def q11_part_value_concentration(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts carrying an outsized (above-mean) share
    of traded value — the scalar-subquery-in-HAVING plan. Adapted: no
    partsupp, so "value" is total lineitem extendedprice per part, and
    the fraction threshold is the mean share (the spec's 0.0001/SF
    constant pinned to part count so the query selects real rows at
    any scale). The threshold is applied by multiplying through in
    exact decimals (value·n_parts > Σvalue) so no float division sits
    on the predicate edge — same trick as Q22. The Σ/count is a 1-row
    aggregate broadcast into the filter."""
    li = load_table(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("__val")
    )
    total = val.agg(
        F.sum("__val").alias("__total"), F.count(F.lit(1)).alias("__n")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("__val") * F.col("__n") > F.col("__total"))
        .select(
            "l_partkey",
            F.round(F.col("__val"), 2).cast("double").alias("traded_value"),
        )
    )


_Q11_SQL = """
WITH val AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS v
  FROM lineitem GROUP BY 1
)
SELECT l_partkey, CAST(ROUND(v, 2) AS DOUBLE) AS traded_value
FROM val
WHERE v * (SELECT CAST(COUNT(*) AS BIGINT) FROM val) > (SELECT SUM(v) FROM val)
"""


def q12_late_shipments(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts split by order priority class
    across shipment buckets. Adapted: no l_shipmode/l_commitdate/
    l_receiptdate in this schema, so the bucket is the order-to-ship
    delay band instead of the ship mode; the
    high-priority/low-priority conditional-count pair is Q12's
    verbatim. Day arithmetic on midnight timestamps is exact in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay > 90, F.lit(">90d"))
        .when(delay > 30, F.lit("31-90d"))
        .otherwise(F.lit("<=30d"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
    )


_Q12_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN '>90d'
            WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN '31-90d'
            ELSE '<=30d' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_priority_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_priority_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q13_customer_order_counts(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many orders
    they placed, INCLUDING zero-order customers — the left outer join
    is the point of the query (an inner join silently drops the
    c_count=0 row). Two shuffles: customer⋈orders on custkey, then a
    ≤(max orders per customer)-row distribution aggregate."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY 1
"""


def q15_top_supplier(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter — the classic view + scalar-max-subquery plan. The max is
    a 1-row aggregate broadcast back against the per-supplier revenue;
    the equality compares exact decimals, so float noise cannot drop
    or duplicate the winner (ties all surface, as in the spec)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        ).alias("__rev")
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("__rev") == F.col("__mx"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("__rev"), 2).cast("double").alias("total_revenue"),
        )
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(ROUND(r, 2) AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
"""


def q17_small_quantity_revenue(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue that would vanish if
    small-quantity orders (below 20% of the part's mean order size)
    were dropped, for one brand. The 0.2·avg threshold is multiplied
    through in exact decimals (5·qty·n < Σqty), so the filter edge is
    bit-stable; the per-part mean comes from a window over the
    broadcast-joined brand subset, not a second scan."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    qty_dec = F.col("l_quantity").cast("decimal(30,2)")
    stats = li.withColumn("__sum_qty", F.sum(qty_dec).over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(w)
    )
    small = stats.where(qty_dec * 5 * F.col("__n") < F.col("__sum_qty"))
    total = small.agg(
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(30,6)")), 2)
        .cast("double")
        .alias("__t")
    )
    return total.select(
        F.round(F.col("__t") / F.lit(7.0), 2).alias("avg_yearly")
    )


_Q17_SQL = """
WITH brand AS (
  SELECT l_partkey, l_quantity, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(30,2))) OVER (PARTITION BY l_partkey) AS sum_qty,
         COUNT(*) OVER (PARTITION BY l_partkey) AS n
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
total AS (
  SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS t
  FROM brand
  WHERE CAST(l_quantity AS DECIMAL(30,2)) * 5 * n < sum_qty
)
SELECT ROUND(t / 7.0, 2) AS avg_yearly FROM total
"""


def q19_bracketed_revenue(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity
    brackets. The disjunction lives in ONE join condition-side filter,
    so Catalyst still pushes the partkey equi-join and evaluates the
    brackets as a codegen'd predicate — no union-of-three-scans."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(bracket).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


_Q19_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2)
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q20_heavy_suppliers(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate supply of a part family
    in one year. Adapted: no partsupp/ps_availqty, so "dominates"
    means the supplier shipped more than half of the part's 1996
    volume (2·supp_qty > total_qty, exact decimals — no float
    threshold). The per-part total is a window over the already
    part-filtered aggregate, not a second scan; the supplier dim joins
    left_semi so no duplicate names."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith("small")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("__supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = shipped.withColumn(
        "__total_qty", F.sum("__supp_qty").over(w)
    ).where(F.col("__supp_qty") * 2 > F.col("__total_qty"))
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return supplier.join(
        dominant.select("l_suppkey").distinct(),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "left_semi",
    )


_Q20_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(30,2))) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
dominant AS (
  SELECT DISTINCT l_suppkey FROM (
    SELECT l_suppkey, supp_qty,
           SUM(supp_qty) OVER (PARTITION BY l_partkey) AS total_qty
    FROM shipped
  ) WHERE supp_qty * 2 > total_qty
)
SELECT s_suppkey, s_name
FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
"""


def q21_waiting_suppliers(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders. Adapted: no l_commitdate/l_receiptdate, so "held up" means
    the supplier is the SOLE supplier shipping on the order's latest
    ship date, on an order with >1 distinct supplier and status 'F' —
    the same exists/not-exists double-correlation as the spec,
    expressed as two grouped joins instead of correlated subqueries
    (Spark and DuckDB both decorrelate to this plan anyway). Timestamp
    equality against the grouped max is exact."""
    orders_f = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    f = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).drop(
        "o_orderkey"
    )
    per_order = f.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("__max_ship"),
        F.countDistinct("l_suppkey").alias("__n_supp"),
    )
    # per_order is ORDER-cardinality (fact-sized at 100 TB) — never
    # broadcast it; the equi-join on l_orderkey sort-merges / AQE-picks.
    last = (
        f.join(per_order.where(F.col("__n_supp") > 1), "l_orderkey")
        .where(F.col("l_shipdate") == F.col("__max_ship"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    solo = (
        last.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") == 1)
        .select("l_orderkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        last.join(solo, "l_orderkey", "left_semi")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q21_SQL = """
WITH f AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT l_orderkey, MAX(l_shipdate) AS max_ship,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM f GROUP BY 1
),
last AS (
  SELECT DISTINCT f.l_orderkey, f.l_suppkey
  FROM f JOIN per_order p ON f.l_orderkey = p.l_orderkey
  WHERE f.l_shipdate = p.max_ship AND p.n_supp > 1
),
solo AS (
  SELECT l_orderkey FROM last GROUP BY 1 HAVING COUNT(*) = 1
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM last
JOIN solo USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1
"""


# name → (fn, oracle) consumed by plans.golden's registry
SUITE = [
    ("q6_forecast_revenue", q6_forecast_revenue, _Q6_SQL),
    ("q7_nation_trade_flows", q7_nation_trade_flows, _Q7_SQL),
    ("q8_market_share", q8_market_share, _Q8_SQL),
    ("q9_part_type_profit", q9_part_type_profit, _Q9_SQL),
    ("q10_returned_items", q10_returned_items, _Q10_SQL),
    ("q11_part_value_concentration", q11_part_value_concentration, _Q11_SQL),
    ("q12_late_shipments", q12_late_shipments, _Q12_SQL),
    ("q13_customer_order_counts", q13_customer_order_counts, _Q13_SQL),
    ("q15_top_supplier", q15_top_supplier, _Q15_SQL),
    ("q17_small_quantity_revenue", q17_small_quantity_revenue, _Q17_SQL),
    ("q19_bracketed_revenue", q19_bracketed_revenue, _Q19_SQL),
    ("q20_heavy_suppliers", q20_heavy_suppliers, _Q20_SQL),
    ("q21_waiting_suppliers", q21_waiting_suppliers, _Q21_SQL),
]
