"""Scalar-function census queries (SURVEY.md §2C scalar surface, §2E) —
string, date, array/map, JSON, conditional — plus shape coverage for
cube/grouping-sets, non-equi joins, scalar subqueries, unpivot."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.functions import dec_sum
from aws_data_pipeline_ads_spark.queries.registry import query
from aws_data_pipeline_ads_spark.session import ensure_utc


@query(
    "q_sample_stratified",
    oracle=(
        "SELECT o_orderstatus, COUNT(*) AS n_sampled, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) "
        "AS sampled_revenue "
        "FROM orders "
        "WHERE (instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS STRING)), 1, 1)) - 1) * 16 "
        "+ (instr('0123456789abcdef', substr(md5(CAST(o_orderkey AS STRING)), 2, 1)) - 1) < 26 "
        "GROUP BY o_orderstatus"
    ),
    doc="D10 as a real operator: deterministic ~10% hash sample "
        "(md5-bucket < 26/256) of orders, per-status counts/revenue — "
        "partitioning-invariant and EXACTLY oracle-verifiable, unlike "
        "rand(seed); operators/sampling.py",
)
def q_sample_stratified(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.sampling import hash_sample

    o = hash_sample(load_table(spark, sf_dir, "orders"), "o_orderkey", 26)
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        dec_sum("o_totalprice", "sampled_revenue"),
    )


@query(
    "q_string_funcs",
    oracle=(
        "SELECT c_custkey, lower(c_name) AS name_lower, "
        "upper(c_mktsegment) AS seg_upper, "
        "lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad, "
        "regexp_extract(c_name, '([0-9]+)', 1) AS name_digits, "
        "split_part(c_name, '#', 1) AS name_prefix, "
        "CAST(length(trim(c_name)) AS BIGINT) AS name_len "
        "FROM customer"
    ),
    doc="2E scalar census: lower/upper/lpad/regexp_extract/split/trim/length",
)
def q_string_funcs(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
        F.length(F.trim(F.col("c_name"))).cast("long").alias("name_len"),
    )


@query(
    "q_date_parts",
    oracle=(
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, "
        "CAST(month(o_orderdate) AS INT) AS m, "
        "CAST(dayofmonth(o_orderdate) AS INT) AS d, "
        "CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start, "
        "strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date "
        "FROM orders"
    ),
    doc="2E scalar census: year/month/day extraction, datediff, date arithmetic",
)
def q_date_parts(spark, sf_dir):
    ensure_utc(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .alias("days_since_epoch_start"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@query(
    "q_agg_cube",
    oracle=(
        "SELECT coalesce(l_returnflag, 'ALL') AS rflag, "
        "coalesce(l_linestatus, 'ALL') AS lstatus, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
    ),
    doc="2C aggs: CUBE grouping sets",
)
def q_agg_cube(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("l_quantity", "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "q_grouping_sets",
    oracle=(
        "SELECT coalesce(l_returnflag, 'ALL') AS rflag, "
        "coalesce(l_linestatus, 'ALL') AS lstatus, COUNT(*) AS n FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    ),
    doc="2C aggs: explicit GROUPING SETS (SQL surface)",
)
def q_grouping_sets(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        "SELECT coalesce(l_returnflag, 'ALL') AS rflag, "
        "coalesce(l_linestatus, 'ALL') AS lstatus, COUNT(*) AS n FROM lineitem_gs "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"
    )


@query(
    "q_range_join",
    oracle=(
        "SELECT o_orderstatus, COUNT(*) AS n FROM lineitem JOIN orders "
        "ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY "
        "GROUP BY o_orderstatus"
    ),
    doc="2C joins: range/theta join — equi key + non-equi time conjunct "
        "(shuffles on the equi key; the range predicate filters post-join)",
)
def q_range_join(spark, sf_dir):
    ensure_utc(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return li.join(o, cond).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_map_keys",
    oracle=(
        "SELECT event_id, array_to_string(json_keys(props), ',') AS prop_keys "
        "FROM events"
    ),
    doc="2E scalar census: JSON → map, map_keys",
)
def q_map_keys(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.array_join(
            F.map_keys(F.from_json("props", "map<string,string>")), ","
        ).alias("prop_keys"),
    )


@query(
    "q_scalar_subquery",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > "
        "(SELECT 1.5 * (CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) "
        "/ COUNT(*)) FROM orders)"
    ),
    doc="2C: scalar subquery — threshold from an exact (decimal) average, "
        "broadcast to the filter",
)
def q_scalar_subquery(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    th = o.agg(
        (1.5 * (F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double")
              / F.count(F.lit(1)))).alias("threshold")
    )
    return (
        o.crossJoin(F.broadcast(th))
        .filter(F.col("o_totalprice") > F.col("threshold"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_set_ops_all",
    oracle=(
        "WITH a AS (SELECT c_nationkey FROM customer WHERE c_acctbal > 5000), "
        "b AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING') "
        "SELECT 'intersect_all' AS op, c_nationkey FROM "
        "(SELECT * FROM a INTERSECT ALL SELECT * FROM b) "
        "UNION ALL SELECT 'except_all' AS op, c_nationkey FROM "
        "(SELECT * FROM a EXCEPT ALL SELECT * FROM b)"
    ),
    doc="2C set ops: bag-semantics INTERSECT ALL / EXCEPT ALL",
)
def q_set_ops_all(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000).select("c_nationkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    return (
        a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "c_nationkey")
        .unionByName(a.exceptAll(b).select(F.lit("except_all").alias("op"), "c_nationkey"))
    )


@query(
    "q_unpivot",
    oracle=(
        "SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part "
        "UNION ALL "
        "SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part"
    ),
    doc="2C: unpivot via stack() — wide → long reshaping",
)
def q_unpivot(spark, sf_dir):
    return load_table(spark, sf_dir, "part").selectExpr(
        "p_partkey",
        "stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE)) "
        "AS (metric, value)",
    )


@query(
    "q_cross_join",
    oracle=(
        "SELECT a.r_name AS region_a, b.r_name AS region_b "
        "FROM region a CROSS JOIN region b"
    ),
    doc="2C joins: cartesian product (bounded dims only — never facts)",
)
def q_cross_join(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("region_a"))
    b = r.select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b)


@query(
    "q_percentile",
    oracle=(
        "SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, "
        "quantile_cont(l_quantity, 0.9) AS p90_qty FROM lineitem "
        "GROUP BY l_returnflag"
    ),
    doc="2C aggs: exact percentile (linear interpolation; "
        "percentile_approx is the sketch-based 100 TB variant)",
)
def q_percentile(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
        )
    )


@query(
    "q_percentile_approx",
    oracle=(
        # the sketch value is engine-specific, but its RANK-ERROR
        # CONTRACT is exact: KLL/GK with accuracy=10000 returns a DATA
        # VALUE whose rank straddles n/2 within ±n/10000 — both
        # SQL-expressible invariants (same move as q_approx_distinct)
        "SELECT l_returnflag, "
        "CAST(COUNT(l_quantity) AS BIGINT) AS n_vals, "
        "TRUE AS median_is_data_value, TRUE AS median_rank_ok "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    doc="2C aggs: percentile_approx (mergeable sketch — single pass at "
        "100 TB). Hash-checked on the sketch's rank contract per "
        "group: the approx median must be an actual data value whose "
        "rank straddles n/2 within the accuracy=10000 rank-error bound "
        "(#{x ≤ med} and #{x ≥ med} both ≥ n/2 − n/10000 − 1); the "
        "oracle pins the exact group sizes — a mis-merged sketch "
        "fails the gate",
)
def q_percentile_approx(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity")
    ap = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("med"),
        F.count("l_quantity").alias("n_vals"))
    g = (
        li.join(F.broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n_vals").alias("n_vals"),
            F.max((F.col("l_quantity") == F.col("med")).cast("int"))
            .alias("__has_eq"),
            F.sum((F.col("l_quantity") <= F.col("med")).cast("long"))
            .alias("__cnt_le"),
            F.sum((F.col("l_quantity") >= F.col("med")).cast("long"))
            .alias("__cnt_ge"),
        )
    )
    slack = F.col("n_vals") / 2 - F.col("n_vals") / 10000 - 1
    return g.select(
        "l_returnflag", "n_vals",
        (F.col("__has_eq") == 1).alias("median_is_data_value"),
        ((F.col("__cnt_le") >= slack)
         & (F.col("__cnt_ge") >= slack)).alias("median_rank_ok"),
    )


@query(
    "q_math_funcs",
    oracle=(
        # Only IEEE-exact ops (abs/ceil/floor/sqrt/sign/%/greatest) plus
        # decimal-rounded round() — ln/exp are libm-implementation-
        # specific and would flake the value hash.
        "SELECT l_orderkey, l_linenumber, "
        "abs(l_extendedprice - 30000.0) AS abs_diff, "
        "CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_kceil, "
        "CAST(floor(l_discount * 100.0) AS BIGINT) AS disc_pct, "
        "sqrt(l_quantity) AS qty_sqrt, "
        "CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS diff_sign, "
        "l_orderkey % 7 AS key_mod, "
        "greatest(l_tax, l_discount) AS max_rate, "
        "least(l_tax, l_discount) AS min_rate, "
        "CAST(round(CAST(l_extendedprice AS DECIMAL(38,6)), 2) AS DOUBLE) "
        "AS price_r2 FROM lineitem"
    ),
    doc="2E scalar census: abs/ceil/floor/sqrt/sign/mod/greatest/least/"
        "round (IEEE-exact subset; round via decimal HALF_UP)",
)
def q_math_funcs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("abs_diff"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_kceil"),
        F.floor(F.col("l_discount") * 100.0).alias("disc_pct"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.signum(F.col("l_extendedprice") - 30000.0).alias("diff_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.round(F.col("l_extendedprice").cast("decimal(38,6)"), 2)
        .cast("double").alias("price_r2"),
    )


@query(
    "q_array_funcs",
    oracle=(
        "SELECT vec_id, CAST(len(embedding) AS INT) AS dim, "
        "round(CAST(embedding[1] AS DOUBLE), 6) AS first_val, "
        "CAST(list_count(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS INT) "
        "AS n_positive FROM embeddings"
    ),
    doc="2E scalar census: array size / element_at / higher-order filter",
)
def q_array_funcs(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb_d, 1), 6).alias("first_val"),
        F.size(F.filter(emb_d, lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "q_ntile_lpad",
    oracle=(
        "SELECT c_mktsegment, "
        "lpad(c_name, 14, '*') AS padded_name, "
        "CAST(ntile(4) OVER (PARTITION BY c_mktsegment "
        "ORDER BY c_acctbal DESC, c_custkey) AS INT) AS acctbal_quartile "
        "FROM customer"
    ),
    doc="scalar census stragglers: lpad + ntile. ntile partitions by "
        "segment (bounded cardinality) — a GLOBAL ntile is a single-"
        "task sort; rank-within-group is the scale-safe form (the "
        "rfm_scores docstring carries the full argument)",
)
def q_ntile_lpad(spark, sf_dir):
    from pyspark.sql import Window as W

    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.lpad("c_name", 14, "*").alias("padded_name"),
        F.ntile(4).over(
            W.partitionBy("c_mktsegment")
            .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        ).alias("acctbal_quartile"),
    )
