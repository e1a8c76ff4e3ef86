"""Relational operators: joins, aggregations, windows, set ops, top-k.

These generalize the reference's only aggregation (the run summary,
/root/reference/lambda/lambda_function.py:353-396) and its projections
(:273-307) into the full relational surface a 100 TB ads warehouse
needs (SURVEY.md §2C).

Scale notes baked into each operator:
- region/nation are broadcast (bounded size at any SF); customer/orders/
  lineitem join via shuffle, where AQE picks sort-merge vs shuffled-hash
  and splits skewed partitions.
- windows partition by high-cardinality keys (custkey, user_id) so state
  per partition stays small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.functions import dec_sum


def star_join_revenue(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                      region: DataFrame) -> DataFrame:
    """Revenue per region/nation over the orders→customer→nation→region star.

    nation/region are broadcast (tiny dims); orders⋈customer shuffles on
    the customer key — the canonical big-fact⋈big-dim pattern.
    """
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "revenue"),
        )
    )


def semi_anti_split(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Customers with orders (left_semi) and without (left_anti), labeled.

    Semi/anti joins shuffle only the keys — no payload duplication —
    which is why they're the scale-safe EXISTS/NOT EXISTS."""
    has = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", F.lit("has_orders").alias("status"))
    )
    not_has = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", F.lit("no_orders").alias("status"))
    )
    return has.unionByName(not_has)


def rollup_revenue(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """ROLLUP(nation, segment) — partial aggregation happens map-side for
    every grouping set; NULL grouping keys are labeled 'ALL'."""
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "revenue"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n_orders",
            "revenue",
        )
    )


def topk_per_group(df: DataFrame, part_key: str, order_col: str, tiebreak: str,
                   k: int) -> DataFrame:
    """Top-k per group via row_number — Spark plans a partial sort within
    partitions; no global sort. Tiebreak column makes the result total-
    ordered and therefore deterministic."""
    w = W.partitionBy(part_key).orderBy(F.desc(order_col), F.asc(tiebreak))
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def running_total(orders: DataFrame) -> DataFrame:
    """Running revenue per customer ordered by date.

    The window sum goes through a decimal cast: exact and order-of-
    addition-independent, so re-runs with different partitioning (or an
    external oracle) agree bit-for-bit."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double").alias("running_total"),
    )


def set_ops_slices(customer: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two customer-key slices, labeled."""
    a = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        a.union(b).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionByName(a.intersect(b).select(F.lit("intersect").alias("op"), "c_custkey"))
        .unionByName(a.exceptAll(b).distinct().select(F.lit("except").alias("op"), "c_custkey"))
    )


def asof_last_value(events: DataFrame, match_type: str = "click") -> DataFrame:
    """As-of join expressed as a window: for every event, the value of the
    most recent `match_type` event of the same user at-or-before its ts.

    Spark has no native as-of join; last(ignorenulls) over an ordered
    window is the shuffle-minimal formulation (single shuffle on user_id,
    no self-join)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.last(
            F.when(F.col("event_type") == match_type, F.col("value")), ignorenulls=True
        ).over(w).alias(f"last_{match_type}_value"),
    )


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str, value_col: str, out_col: str,
              left_keep: list[str]) -> DataFrame:
    """Two-table as-of join: each left row gets `value_col` from the
    right row with the greatest right_ts <= left_ts for the same keys.

    Union-merge formulation: tag the streams, union, one window pass
    with last(ignorenulls) — ONE shuffle on the keys, no self-join, no
    per-row range probe. The classic join-then-rank alternative is
    O(left×right) per key; this is O((left+right) log) per key and is
    the shape that survives 100 TB.

    Right side must be unique per (on, right_ts) — pre-aggregate ties
    (e.g. max_by) or the result is nondeterministic.
    """
    vtype = right.schema[value_col].dataType
    l = left.select(
        *on,
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_keep],
        F.lit(None).cast(vtype).alias("__v"),
    )
    r = right.select(
        *on,
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_keep],
        F.col(value_col).alias("__v"),
    )
    # __is_left ascending: a right row at exactly left_ts is visible
    # (at-or-before semantics, matching SQL ASOF's >=).
    w = (
        W.partitionBy(*on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        l.unionByName(r)
        .withColumn(out_col, F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .drop("__v", "__is_left", "__ts")
    )


def interval_join(points: DataFrame, point_ts: str,
                  intervals: DataFrame, start_ts: str, end_ts: str,
                  bin_seconds: int = 3600, how: str = "inner") -> DataFrame:
    """Pure interval join (point ∈ [start, end)) WITHOUT an equi key.

    Naive `points.join(intervals, (ts >= start) & (ts < end))` plans as
    BroadcastNestedLoopJoin — O(points × intervals), the 100 TB
    killer. Binning converts it to an equi-join: each point maps to its
    time bin, each interval explodes to every bin it overlaps, join on
    bin WITH the exact range predicate folded into the join condition —
    so `how='left'` keeps null-extended unmatched points (a post-join
    filter would silently drop them back to inner semantics). A point's
    single bin meets each overlapping interval exactly once → no dedup
    needed. Choose bin_seconds ≈ median interval length so explode
    stays ~O(intervals).

    Only 'inner' and 'left' are supported: the interval side is
    exploded one row per overlapped bin, so right/full outer would emit
    an unmatched interval once PER BIN — wrong multiplicity.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_join supports how='inner'|'left', got {how!r} "
            "(the exploded interval side breaks right/full multiplicity)"
        )
    w = F.lit(int(bin_seconds))
    p = points.withColumn("__pbin", F.floor(F.unix_timestamp(F.col(point_ts)) / w))
    i = intervals.withColumn(
        "__ibin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / w),
                F.floor(F.unix_timestamp(F.col(end_ts)) / w),
            )
        ),
    )
    cond = (
        (p["__pbin"] == i["__ibin"])
        & (p[point_ts] >= i[start_ts])
        & (p[point_ts] < i[end_ts])
    )
    return p.join(i, cond, how).drop("__pbin", "__ibin")


def pivot_event_counts(events: DataFrame, types: list[str]) -> DataFrame:
    """Pivot event_type into per-type count columns per user.

    Passing the pivot values explicitly avoids the extra distinct-values
    job Spark otherwise runs — mandatory at scale."""
    agg = events.groupBy("user_id").pivot("event_type", types).count()
    # count() leaves NULL for absent combos; normalize to 0 for stability.
    return agg.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types]
    )


def rolling_time_window(events: DataFrame, window_seconds: int = 3600,
                        key: str = "user_id", ts_col: str = "ts",
                        val_col: str = "value") -> DataFrame:
    """Per-key rolling aggregate over a TIME range frame — every event
    annotated with the count/sum of that key's events in the trailing
    `window_seconds` (rate limiting, spend pacing, anomaly baselines).

    RANGE frame over epoch micros, not a ROWS frame: the window is
    defined by TIME distance, so bursts contribute their true
    cardinality regardless of row spacing. One exchange on the key; the
    rolling sum goes through the decimal cast (order-invariant, exact).
    """
    w = (
        W.partitionBy(key)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    dec = F.col(val_col).cast("decimal(38,6)")
    return events.select(
        key, "event_id",
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
        F.sum(dec).over(w).cast("double").alias("sum_trailing"),
    )


def association_rules(baskets: DataFrame, basket_col: str, item_col: str,
                      min_pair_support: int = 3, top: int = 100) -> DataFrame:
    """Market-basket association rules over (basket, item) rows:
    directed rules a→b with support, confidence, and lift, top-`top`
    by lift (deterministic tiebreak on the item ids).

    The a-priori heavy lifting reduced to its scalable core: distinct
    (basket, item) → item supports (one agg) and within-basket pair
    supports (one self-equi-join on the basket key + one agg — the
    quadratic is bounded per basket, the m×n trap of a global item
    cross join never appears). The pair table is pruned by
    `min_pair_support` BEFORE joining supports back, so the
    statistics joins run on the interesting-pair subset only. The
    basket total is a 1-row broadcast. Confidence/lift are single
    double divisions of exact counts — engine-invariant, emitted
    rounded to 6.
    """
    from aws_data_pipeline_ads_spark.operators.cache import persist_tracked

    # Four consumers (item supports, both legs of the pair self-join,
    # the basket total) would each re-run the corpus scan + distinct —
    # the slim (basket, item) projection rides a tracked persist.
    bi = persist_tracked(
        baskets.select(
            F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
        ).distinct()
    )
    supp = bi.groupBy("it").agg(F.count(F.lit(1)).alias("supp"))
    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(b, (F.col("a.bk") == F.col("b.bk"))
               & (F.col("a.it") < F.col("b.it")))
        .groupBy(F.col("a.it").alias("x"), F.col("b.it").alias("y"))
        .agg(F.count(F.lit(1)).alias("supp_xy"))
        .filter(F.col("supp_xy") >= min_pair_support)
    )
    directed = pairs.select(
        F.explode(F.array(
            F.struct(F.col("x").alias("antecedent"),
                     F.col("y").alias("consequent"), "supp_xy"),
            F.struct(F.col("y").alias("antecedent"),
                     F.col("x").alias("consequent"), "supp_xy"),
        )).alias("r")
    ).select("r.*")
    n_b = bi.select("bk").distinct().agg(
        F.count(F.lit(1)).alias("__n")
    )
    sa = supp.select(F.col("it").alias("antecedent"),
                     F.col("supp").alias("supp_a"))
    sc = supp.select(F.col("it").alias("consequent"),
                     F.col("supp").alias("supp_c"))
    out = (
        directed.join(sa, "antecedent").join(sc, "consequent")
        .join(F.broadcast(n_b))
        .select(
            "antecedent", "consequent",
            F.col("supp_xy").alias("pair_support"),
            F.round(F.col("supp_xy") / F.col("supp_a"), 6).alias("confidence"),
            F.round(
                (F.col("supp_xy") * F.col("__n"))
                / (F.col("supp_a") * F.col("supp_c")), 6
            ).alias("lift"),
        )
    )
    return (
        out.orderBy(F.desc("lift"), F.asc("antecedent"), F.asc("consequent"))
        .limit(top)
    )
