"""Relational query set: joins, aggregations, windows, set ops, dedup
(SURVEY.md §2C/§2D). Builders delegate to the operator library."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.functions import dec_avg, dec_sum
from aws_data_pipeline_ads_spark.operators import relational
from aws_data_pipeline_ads_spark.queries.registry import query
from aws_data_pipeline_ads_spark.session import ensure_utc

_DEC_SUM_SQL = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"


@query(
    "q_dedup",
    oracle="SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem",
    doc="D2: exact dedup on a compound key",
)
def q_dedup(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .dropDuplicates(["l_orderkey", "l_linenumber"])
    )


@query(
    "q_dedup_latest",
    oracle=(
        "SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str "
        "FROM (SELECT user_id, event_id, ts, row_number() OVER "
        "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
        "WHERE rn = 1"
    ),
    doc="D2: latest-wins dedup via window rank",
)
def q_dedup_latest(spark, sf_dir):
    ensure_utc(spark)
    from aws_data_pipeline_ads_spark.operators.dedup import latest_by_key

    latest = latest_by_key(load_table(spark, sf_dir, "events"), "user_id", "ts", "event_id")
    return latest.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
    )


@query(
    "q_join_star",
    oracle=(
        "SELECT r_name, n_name, COUNT(*) AS n_orders, "
        + _DEC_SUM_SQL.format(x="o_totalprice")
        + " AS revenue FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name, n_name"
    ),
    bench=True,
    doc="2C joins: fact⋈dim star with broadcast dims",
)
def q_join_star(spark, sf_dir):
    return relational.star_join_revenue(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "q_join_flagship",
    oracle=(
        "SELECT n_name, "
        + _DEC_SUM_SQL.format(x="l_extendedprice * (1 - l_discount)")
        + " AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY n_name"
    ),
    bench=True,
    doc="flagship TPC-H-Q5-alike: 5-way star join + filtered agg "
        "(driver smoke query via entry())",
)
def q_join_flagship(spark, sf_dir):
    ensure_utc(spark)
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(revenue, "revenue"))
    )


@query(
    "q_semi_anti",
    oracle=(
        "SELECT c_custkey, 'has_orders' AS status FROM customer "
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
        "UNION ALL "
        "SELECT c_custkey, 'no_orders' AS status FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ),
    doc="2C joins: left_semi / left_anti (EXISTS / NOT EXISTS)",
)
def q_semi_anti(spark, sf_dir):
    return relational.semi_anti_split(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@query(
    "q_agg_rollup",
    oracle=(
        "SELECT coalesce(n_name, 'ALL') AS nation, "
        "coalesce(c_mktsegment, 'ALL') AS segment, COUNT(*) AS n_orders, "
        + _DEC_SUM_SQL.format(x="o_totalprice")
        + " AS revenue FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY ROLLUP(n_name, c_mktsegment)"
    ),
    bench=True,
    doc="2C aggs: ROLLUP grouping sets",
)
def q_agg_rollup(spark, sf_dir):
    return relational.rollup_revenue(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


@query(
    "q_count_distinct",
    oracle=(
        "SELECT COUNT(DISTINCT l_partkey) AS n_parts, "
        "COUNT(DISTINCT l_suppkey) AS n_supps FROM lineitem"
    ),
    doc="2C aggs: exact multi-column distinct (expands to two shuffles; "
        "see q_approx_distinct for the 100 TB variant)",
)
def q_count_distinct(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "q_approx_distinct",
    oracle=None,  # HLL++ sketch differs across engines → rows-only check
    bench=True,
    doc="2C aggs: approx_count_distinct (HyperLogLog++) — the sketch is "
        "mergeable, so one pass / no key shuffle at 100 TB",
)
def q_approx_distinct(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_partkey").alias("n_parts_approx"),
        F.approx_count_distinct("l_suppkey").alias("n_supps_approx"),
    )


@query(
    "q_window_rank",
    oracle=(
        "SELECT o_custkey, o_orderkey, o_totalprice FROM "
        "(SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn "
        "FROM orders) WHERE rn <= 3"
    ),
    bench=True,
    doc="2C windows: top-3 per customer via row_number",
)
def q_window_rank(spark, sf_dir):
    return relational.topk_per_group(
        load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        "o_custkey", "o_totalprice", "o_orderkey", 3,
    )


@query(
    "q_window_running",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "AS running_total FROM orders"
    ),
    doc="2C windows: running aggregate (decimal-exact, order-invariant)",
)
def q_window_running(spark, sf_dir):
    return relational.running_total(load_table(spark, sf_dir, "orders"))


@query(
    "q_set_ops",
    oracle=(
        "WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000), "
        "b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') "
        "SELECT 'union' AS op, c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b) "
        "UNION ALL SELECT 'intersect' AS op, c_custkey FROM "
        "(SELECT * FROM a INTERSECT SELECT * FROM b) "
        "UNION ALL SELECT 'except' AS op, c_custkey FROM "
        "(SELECT * FROM a EXCEPT SELECT * FROM b)"
    ),
    doc="2C set ops: UNION / INTERSECT / EXCEPT",
)
def q_set_ops(spark, sf_dir):
    return relational.set_ops_slices(load_table(spark, sf_dir, "customer"))


@query(
    "q_pivot_counts",
    oracle=(
        "SELECT user_id, "
        "COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click, "
        "COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view, "
        "COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase, "
        "COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup, "
        "COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error "
        "FROM events GROUP BY user_id"
    ),
    doc="2C: pivot with explicit values (skips the distinct-values pre-job)",
)
def q_pivot_counts(spark, sf_dir):
    return relational.pivot_event_counts(
        load_table(spark, sf_dir, "events"),
        ["click", "view", "purchase", "signup", "error"],
    )


@query(
    "q_asof_lastclick",
    oracle=(
        "SELECT user_id, event_id, last_value(CASE WHEN event_type = 'click' "
        "THEN value END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, "
        "event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS last_click_value FROM events"
    ),
    doc="2C joins: as-of join expressed as last(ignorenulls) window — "
        "single shuffle, no self-join",
)
def q_asof_lastclick(spark, sf_dir):
    ensure_utc(spark)
    return relational.asof_last_value(load_table(spark, sf_dir, "events"), "click")


@query(
    "q_asof_join",
    oracle=(
        # DuckDB has native ASOF; Spark side is the union-merge operator.
        # Right side pre-deduped to one row per (custkey, date) via
        # max_by so tie semantics are engine-independent.
        "WITH r AS (SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ots, "
        "max_by(o_totalprice, o_orderkey) AS price "
        "FROM orders GROUP BY o_custkey, CAST(o_orderdate AS TIMESTAMP)) "
        "SELECT e.event_id, e.user_id, r.price AS last_order_price "
        "FROM events e ASOF LEFT JOIN r "
        "ON e.user_id = r.o_custkey AND e.ts >= r.ots"
    ),
    doc="2C joins: two-table as-of join (events ← most recent prior "
        "order per user), union-merge single-shuffle formulation",
)
def q_asof_join(spark, sf_dir):
    ensure_utc(spark)
    events = load_table(spark, sf_dir, "events")
    orders_dedup = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.col("o_orderdate").cast("timestamp").alias("ots"))
        .agg(F.max_by("o_totalprice", "o_orderkey").alias("price"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    return relational.asof_join(
        events, orders_dedup, on=["user_id"],
        left_ts="ts", right_ts="ots",
        value_col="price", out_col="last_order_price",
        left_keep=["event_id"],
    ).select("event_id", "user_id", "last_order_price")


@query(
    "q_sql_over_lake",
    oracle=(
        "SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) "
        "AS DOUBLE) AS revenue FROM lineitem "
        "WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
    doc="D1: ad-hoc SQL over the lake (the analytics layer the reference "
        "declares but never implements) — TPC-H Q6 via spark.sql over "
        "registered views",
)
def q_sql_over_lake(spark, sf_dir):
    from aws_data_pipeline_ads_spark.catalog import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        "SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) "
        "AS DOUBLE) AS revenue FROM lineitem "
        "WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    )


@query(
    "q_window_lag_lead",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "lag(o_totalprice) OVER w AS prev_price, "
        "lead(o_totalprice) OVER w AS next_price, "
        "CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) "
        "AS INT) AS status_rank, "
        "CAST(ntile(4) OVER w AS INT) AS quartile, "
        "first_value(o_orderkey) OVER w AS first_order "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"
    ),
    doc="2C windows: lag/lead/dense_rank/ntile/first_value census",
)
def q_window_lag_lead(spark, sf_dir):
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ws = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.dense_rank().over(ws).alias("status_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@query(
    "q_tpch_q3",
    oracle=(
        "SELECT l_orderkey, "
        + _DEC_SUM_SQL.format(x="l_extendedprice * (1 - l_discount)")
        + " AS revenue, "
        "strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1997-06-01' "
        "AND l_shipdate > TIMESTAMP '1997-06-01' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    bench=True,
    doc="TPC-H Q3-alike: selective dim filter → two fact joins → agg → "
        "top-k (TakeOrderedAndProject); both date filters pushed to scans",
)
def q_tpch_q3(spark, sf_dir):
    ensure_utc(spark)
    cutoff = F.lit("1997-06-01").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q13",
    oracle=(
        "WITH per_cust AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) "
        "SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY c_count"
    ),
    doc="TPC-H Q13-alike: left outer join with a join-side predicate, "
        "then a distribution (agg of agg)",
)
def q_tpch_q13(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_tpch_q18",
    oracle=(
        "WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
        "HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 55) "
        "SELECT c_name, c_custkey, o_orderkey, "
        "strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice, "
        + _DEC_SUM_SQL.format(x="l_quantity") + " AS sum_qty "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "JOIN big ON big.l_orderkey = o_orderkey "
        "GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"
    ),
    doc="TPC-H Q18-alike: HAVING-filtered semi-reduction joined back to "
        "the fact, top-k by price",
)
def q_tpch_q18(spark, sf_dir):
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 55)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(big, li.l_orderkey == big.big_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity", "sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q_top_supplier",
    oracle=(
        "WITH rev AS (SELECT l_suppkey, "
        + _DEC_SUM_SQL.format(x="l_extendedprice * (1 - l_discount)")
        + " AS total_rev FROM lineitem GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_rev FROM supplier "
        "JOIN rev ON s_suppkey = l_suppkey "
        "WHERE total_rev = (SELECT MAX(total_rev) FROM rev) "
        "ORDER BY s_suppkey"
    ),
    doc="TPC-H Q15-alike: agg-of-agg — revenue per supplier, keep the "
        "max via scalar subquery over the derived table",
)
def q_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("m"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(rev, supp.s_suppkey == rev.l_suppkey)
        .join(max_rev, rev.total_rev == max_rev.m)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q14",
    oracle=(
        "SELECT CAST(100.0 * "
        "CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) "
        "ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) / "
        + _DEC_SUM_SQL.format(x="l_extendedprice * (1 - l_discount)")
        + " AS DOUBLE) AS promo_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-03-01'"
    ),
    doc="TPC-H Q14-alike: conditional-aggregate ratio (promo revenue %) "
        "over a date-pruned fact⋈dim join",
)
def q_tpch_q14(spark, sf_dir):
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(38,6)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (100.0 * F.sum(promo).cast("double")
             / F.sum(rev).cast("double")).alias("promo_pct")
        )
    )


@query(
    "q_tpch_q19",
    oracle=(
        "SELECT " + _DEC_SUM_SQL.format(x="l_extendedprice * (1 - l_discount)")
        + " AS revenue, COUNT(*) AS n_lines "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity BETWEEN 1 AND 25) "
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 40 "
        "AND l_quantity BETWEEN 10 AND 40)"
    ),
    doc="TPC-H Q19-alike: disjunctive multi-column predicates across both "
        "join sides (OR of conjunct bundles)",
)
def q_tpch_q19(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 25)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 40)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond1 | cond2)
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q_tpch_q22",
    oracle=(
        "WITH avg_bal AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) "
        "AS DOUBLE) / COUNT(*) AS a FROM customer WHERE c_acctbal > 0.0) "
        "SELECT c_mktsegment, COUNT(*) AS n_cust, "
        + _DEC_SUM_SQL.format(x="c_acctbal") + " AS total_bal "
        "FROM customer, avg_bal "
        "WHERE c_acctbal > avg_bal.a "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F') "
        "GROUP BY c_mktsegment"
    ),
    doc="TPC-H Q22-alike: scalar subquery threshold + anti join (rich "
        "customers with no orders) per segment",
)
def q_tpch_q22(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
             / F.count(F.lit(1))).alias("a")
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return (
        cust.join(avg_bal)  # 1-row cross join → broadcast scalar
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dec_sum("c_acctbal", "total_bal"),
        )
    )


@query(
    "q_tpch_q1",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        + _DEC_SUM_SQL.format(x="l_quantity") + " AS sum_qty, "
        + _DEC_SUM_SQL.format(x="l_extendedprice") + " AS sum_base_price, "
        + _DEC_SUM_SQL.format(x="l_extendedprice * (1 - l_discount)")
        + " AS sum_disc_price, "
        + _DEC_SUM_SQL.format(x="(l_extendedprice * (1 - l_discount)) * (1 + l_tax)")
        + " AS sum_charge, "
        + _DEC_SUM_SQL.format(x="l_quantity") + " / COUNT(*) AS avg_qty, "
        + _DEC_SUM_SQL.format(x="l_discount") + " / COUNT(*) AS avg_disc, "
        "COUNT(*) AS count_order FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    bench=True,
    doc="TPC-H Q1-alike: wide scan agg — the throughput benchmark workhorse",
)
def q_tpch_q1(spark, sf_dir):
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity", "sum_qty"),
        dec_sum("l_extendedprice", "sum_base_price"),
        dec_sum(disc_price, "sum_disc_price"),
        dec_sum(charge, "sum_charge"),
        dec_avg("l_quantity", "avg_qty"),
        dec_avg("l_discount", "avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "q_tpch_q5",
    oracle=(
        "SELECT n_name, "
        + _DEC_SUM_SQL.format(x="l_extendedprice * (1 - l_discount)")
        + " AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY n_name"
    ),
    doc="TPC-H Q5 (full, incl. supplier): CYCLIC join graph — the "
        "customer-supplier same-nation equality closes a cycle the "
        "optimizer must order well; dims broadcast, date filter pushed",
)
def q_tpch_q5(spark, sf_dir):
    ensure_utc(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dec_sum(revenue, "revenue"))
    )


@query(
    "q_tpch_q10",
    oracle=(
        "SELECT c_custkey, c_name, "
        + _DEC_SUM_SQL.format(x="l_extendedprice * (1 - l_discount)")
        + " AS revenue, c_acctbal, n_name "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-04-01' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    doc="TPC-H Q10 (returned-item reporting): quarter + returnflag "
        "filters pushed to both fact scans, 20-row TakeOrdered top-k",
)
def q_tpch_q10(spark, sf_dir):
    ensure_utc(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(revenue, "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_q17",
    oracle=(
        "SELECT " + _DEC_SUM_SQL.format(x="l_extendedprice")
        + " / 7.0 AS avg_yearly, COUNT(*) AS n_small "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#1' "
        "AND l_quantity < 0.2 * ("
        "SELECT " + _DEC_SUM_SQL.format(x="l_quantity")
        + " / COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)"
    ),
    doc="TPC-H Q17 (small-quantity revenue): correlated scalar AVG "
        "subquery decorrelated into a per-part aggregate JOINED back — "
        "the aggregate is computed only for the brand's parts (semi "
        "pushdown), not the whole part space. Decimal-exact threshold "
        "arithmetic so the boundary compare matches the oracle.",
)
def q_tpch_q17(spark, sf_dir):
    # Decorrelation: (1) restrict partkeys to the brand, (2) one grouped
    # aggregate over ONLY those parts' lineitems (semi join before the
    # agg — at 100 TB this is the difference between aggregating the
    # brand's ~1/25th of lineitem and aggregating all of it), (3) join
    # thresholds back and filter. Two shuffles total; the brand part
    # list broadcasts.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li_brand = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresholds = li_brand.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
         / F.count(F.lit(1))).alias("avg_qty")
    ).select(F.col("l_partkey").alias("t_partkey"),
             (F.lit(0.2) * F.col("avg_qty")).alias("qty_thresh"))
    return (
        li_brand.join(thresholds, li_brand.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
             / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "q_tpch_q4",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-04-01' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
        "GROUP BY o_orderpriority"
    ),
    doc="TPC-H Q4 (order-priority checking, late-ship variant): "
        "correlated EXISTS with a NON-equi predicate (l_shipdate > "
        "o_orderdate + 60 days) decorrelated into a left-semi hash join "
        "on l_orderkey carrying the residual date condition — no "
        "nested-loop, no per-row subquery.",
)
def q_tpch_q4(spark, sf_dir):
    ensure_utc(spark)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late_exists.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q_tpch_q21",
    oracle=(
        "SELECT s.s_name, COUNT(DISTINCT l.l_orderkey) AS numwait "
        "FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey "
        "WHERE l.l_returnflag = 'R' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l.l_orderkey "
        "AND l2.l_suppkey <> l.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l.l_orderkey "
        "AND l3.l_suppkey <> l.l_suppkey AND l3.l_returnflag = 'R') "
        "GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 20"
    ),
    doc="TPC-H Q21 (suppliers-who-kept-orders-waiting variant): "
        "EXISTS + NOT EXISTS over the SAME fact decorrelated into ONE "
        "order-level aggregate (n_supp, n_r_supp) joined back — the "
        "oracle runs the two correlated subqueries, the Spark plan "
        "scans lineitem twice and shuffles it once per side instead of "
        "per-row probing. sole-R-supplier ⇔ n_r_supp == 1 given the "
        "outer row is itself 'R'; another-supplier ⇔ n_supp >= 2.",
)
def q_tpch_q21(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    order_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    r_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    culprits = (
        r_pairs.join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        culprits.join(supplier, culprits.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        # r_pairs is distinct on (order, supp) → count(*) == distinct orders
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "q_tpch_q16",
    oracle=(
        "SELECT p_brand, p_type, p_size, "
        "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM part JOIN lineitem ON l_partkey = p_partkey "
        "WHERE p_size IN (1, 7, 14, 23, 36, 45) "
        "AND l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 2500.0) "
        "GROUP BY p_brand, p_type, p_size"
    ),
    doc="TPC-H Q16 (supplier-count variant): NOT IN subquery "
        "decorrelated into a broadcast left-anti join (s_suppkey is "
        "non-null so NOT IN ≡ anti join), then grouped distinct count. "
        "The blocklist is aggregated/broadcast once, never re-probed.",
)
def q_tpch_q16(spark, sf_dir):
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2500.0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 7, 14, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(bad_supp),
                li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
