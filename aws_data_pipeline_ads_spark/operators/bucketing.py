"""Bucketed (pre-shuffled) tables for co-located joins.

At 100 TB the fact⋈fact join's shuffle is the dominant cost. Writing
both tables bucketed by the join key with the same bucket count lets
every future join/aggregation on that key run shuffle-free: each task
reads bucket i of both sides. One shuffle at write time is amortized
over every downstream query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist `df` as a bucketed+sorted managed parquet table.

    Sorting within buckets additionally removes the sort from future
    sort-merge joins on the bucket key (plan becomes scan→join).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on `on` with equal bucket counts —
    planner sees matching hash distributions and emits no Exchange
    (assert via plans.assert_no_exchange in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str,
                          n_buckets: int = 16) -> tuple[str, str]:
    """Write orders + lineitem bucketed AND sorted by their order key
    (once per session + corpus; a write-side job like any serving
    index). Every downstream orderkey join — the dominant fact⋈fact
    shuffle of the TPC-H shapes, and THE shuffle that matters at
    100 TB — then runs with zero Exchange and zero Sort: each task
    reads bucket i of both tables. Returns (orders_tbl, lineitem_tbl).

    Managed-table names are derived from sf_dir; the in-memory catalog
    is per-session, so a fresh JVM rebuilds once (the parquet files in
    the warehouse are overwritten, never appended)."""
    import re

    from aws_data_pipeline_ads_spark.catalog import load_table

    tag = re.sub(r"[^A-Za-z0-9]+", "_", sf_dir.strip("/"))
    ot, lt = f"b_orders_{tag}", f"b_lineitem_{tag}"
    for tbl, src, key in ((ot, "orders", "o_orderkey"),
                          (lt, "lineitem", "l_orderkey")):
        if spark.catalog.tableExists(tbl):
            continue
        # The default catalog is in-memory per session, but the managed
        # location survives on disk — a fresh JVM finding an orphaned
        # location must clear it or saveAsTable refuses
        # (LOCATION_ALREADY_EXISTS).
        import shutil
        from urllib.parse import urlparse

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc = urlparse(f"{warehouse}/{tbl}")
        if loc.scheme in ("", "file"):
            shutil.rmtree(loc.path, ignore_errors=True)
        write_bucketed(load_table(spark, sf_dir, src), tbl, [key], n_buckets)
    return ot, lt
