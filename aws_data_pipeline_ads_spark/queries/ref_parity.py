"""Reference-parity queries (SURVEY.md §2A ops → §2D names).

Each query re-expresses one or more operators the reference executes in
its per-record Python loop (/root/reference/lambda/lambda_function.py)
as a declarative Spark plan over the oracle tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.functions import (
    cast_default,
    dec_sum,
    full_name,
    surrogate_key,
    truncate,
)
from aws_data_pipeline_ads_spark.queries.registry import query
from aws_data_pipeline_ads_spark.session import ensure_utc


@query(
    "q_scan_project",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice, 'orders' AS source FROM orders",
    doc="ops 5,10,11: scan + column projection + literal source column",
)
def q_scan_project(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("source", F.lit("orders"))
    )


@query(
    "q_surrogate_hash",
    oracle=(
        "SELECT o_orderkey, substr(md5(concat_ws('_', 'orders', "
        "CAST(o_orderkey AS VARCHAR), o_orderstatus, o_orderpriority)), 1, 12) "
        "AS record_id FROM orders"
    ),
    doc="op 9: content-keyed surrogate id (reference salts with time+idx at "
        "lambda_function.py:260-261; content-keyed here for determinism)",
)
def q_surrogate_hash(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        surrogate_key("o_orderkey", "o_orderstatus", "o_orderpriority",
                      prefix="orders").alias("record_id"),
    )


@query(
    "q_cast_default",
    oracle=(
        "SELECT p_partkey, CAST(coalesce(p_retailprice, 0) AS DOUBLE) AS price "
        "FROM part"
    ),
    doc="op 12: float(record.get('price', 0)) → coalesce+cast",
)
def q_cast_default(spark, sf_dir):
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", cast_default("p_retailprice").alias("price")
    )


@query(
    "q_truncate_concat",
    oracle=(
        "SELECT c_custkey, substr(c_name, 1, 200) AS name_trunc, "
        "concat_ws(' ', c_name, c_mktsegment) AS full_label FROM customer"
    ),
    doc="ops 13,16: [:200] truncation + f-string concat",
)
def q_truncate_concat(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        truncate("c_name", 200).alias("name_trunc"),
        full_name("c_name", "c_mktsegment").alias("full_label"),
    )


@query(
    "q_rename_project",
    oracle=(
        "SELECT o_orderkey AS order_id, o_custkey AS user_id, "
        "o_orderstatus AS status, o_totalprice AS amount FROM orders"
    ),
    doc="op 14: projection + rename (userId → user_id analogue)",
)
def q_rename_project(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("amount"),
    )


@query(
    "q_null_guard",
    oracle=(
        "SELECT COUNT(*) AS n_rows, "
        "COUNT(CASE WHEN c_name IS NULL THEN 1 END) AS n_name_null, "
        "COUNT(CASE WHEN c_acctbal IS NULL THEN 1 END) AS n_acctbal_null, "
        "COUNT(CASE WHEN c_name IS NOT NULL AND c_acctbal IS NOT NULL THEN 1 END) "
        "AS n_valid FROM customer"
    ),
    doc="op 17 + D4: key-presence guard and per-column null counts",
)
def q_null_guard(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("c_name").isNull(), 1)).alias("n_name_null"),
        F.count(F.when(F.col("c_acctbal").isNull(), 1)).alias("n_acctbal_null"),
        F.count(
            F.when(F.col("c_name").isNotNull() & F.col("c_acctbal").isNotNull(), 1)
        ).alias("n_valid"),
    )


@query(
    "q_limit_topk",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    doc="op 6: limit pushdown analogue — total-ordered top-k "
        "(plans as TakeOrderedAndProject, no global sort)",
)
def q_limit_topk(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q_status_filter",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'F'"
    ),
    doc="op 5 (:217-219): status-code filter analogue; predicate pushes "
        "to the parquet scan",
)
def q_status_filter(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_envelope_date",
    oracle=(
        "SELECT strftime(o_orderdate, '%Y-%m-%d') AS extracted_date, "
        "COUNT(*) AS n_records FROM orders GROUP BY 1"
    ),
    doc="ops 10,18 + D5: date partition column derivation + per-partition counts",
)
def q_envelope_date(spark, sf_dir):
    ensure_utc(spark)
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("extracted_date"))
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


@query(
    "q_run_summary",
    oracle=(
        "SELECT event_type, COUNT(*) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value "
        "FROM events GROUP BY event_type"
    ),
    bench=True,
    doc="op 22: run-summary aggregation generalized to per-type counts/sums",
)
def q_run_summary(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", "total_value"))
    )


# ---------------------------------------------------------------------------
# Column profiler (D3 schema validation + D4 null checks, generalized)
# ---------------------------------------------------------------------------

# (column, render kind) — one spec drives BOTH the Spark renderers and
# the generated oracle SQL, so min/max string renderings stay identical.
_PROFILE_SPEC = [
    ("o_orderkey", "plain"),
    ("o_custkey", "plain"),
    ("o_orderstatus", "plain"),
    ("o_orderpriority", "plain"),
    ("o_totalprice", "dec"),   # double → decimal(18,2): engine-neutral text
    ("o_orderdate", "ts"),     # timestamp → explicit micros format
]

_SQL_RENDER = {
    "plain": "CAST({m}({c}) AS VARCHAR)",
    "dec": "CAST(CAST({m}({c}) AS DECIMAL(18,2)) AS VARCHAR)",
    "ts": "strftime({m}({c}), '%Y-%m-%d %H:%M:%S.%f')",
}


def _profile_oracle() -> str:
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    selects = []
    for c, kind in _PROFILE_SPEC:
        aggs += [
            f"CAST(COUNT({c}) AS BIGINT) AS cnt_{c}",
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}",
            _SQL_RENDER[kind].format(m="MIN", c=c) + f" AS mn_{c}",
            _SQL_RENDER[kind].format(m="MAX", c=c) + f" AS mx_{c}",
        ]
        selects.append(
            f"SELECT '{c}' AS col_name, n_rows, n_rows - cnt_{c} AS n_nulls, "
            f"nd_{c} AS n_distinct, mn_{c} AS min_value, mx_{c} AS max_value "
            "FROM a"
        )
    return "WITH a AS (SELECT " + ", ".join(aggs) + " FROM orders) " + \
        " UNION ALL ".join(selects)


@query(
    "q_profile",
    oracle=_profile_oracle(),
    doc="D3/D4 generalized: single-pass column profile of `orders` — "
        "nulls, exact distincts, rendered min/max per column in ONE "
        "aggregation + inline unpivot (operators/profiling.py)",
)
def q_profile(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.profiling import profile
    from aws_data_pipeline_ads_spark.session import ensure_utc

    ensure_utc(spark)
    ts_render = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    renderers = {
        "double": lambda c: c.cast("decimal(18,2)").cast("string"),
        "timestamp": ts_render,
        "timestamp_ntz": ts_render,  # parquet TIMESTAMP reads as NTZ here
    }
    return profile(
        load_table(spark, sf_dir, "orders"),
        columns=[c for c, _ in _PROFILE_SPEC],
        renderers=renderers,
    )


@query(
    "q_merge_upsert",
    oracle=(
        "WITH src AS ("
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal, "
        "c_mktsegment FROM customer WHERE c_custkey % 7 = 0 "
        "UNION ALL "
        "SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, "
        "'NEW' AS c_mktsegment FROM customer WHERE c_custkey % 11 = 3), "
        "kept AS (SELECT c.* FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.c_custkey = c.c_custkey)) "
        "SELECT * FROM kept UNION ALL SELECT * FROM src"
    ),
    doc="lakehouse MERGE INTO semantics: deterministic change batch "
        "(updates for custkey%7=0, inserts keyed past the range) upserted "
        "into customer — anti-join ∪ source, change batch broadcast "
        "(operators/upsert.py)",
)
def q_merge_upsert(spark, sf_dir):
    from aws_data_pipeline_ads_spark.operators.upsert import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100
    )
    inserts = cust.filter(F.col("c_custkey") % 11 == 3).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        "c_name", "c_nationkey", "c_acctbal",
        F.lit("NEW").alias("c_mktsegment"),
    )
    return merge_upsert(cust, updates.unionByName(inserts), "c_custkey")
