"""Slowly-changing-dimension (Type 2) build from a change log.

The warehouse-side twin of the reference's per-source extract: ingested
attribute streams become versioned dimension rows with effective-dated
validity windows — the standard shape for joining facts to
"the attribute as of the fact's time" (see also relational.as_of_join,
which consumes exactly this layout).

Scale shape: both windows partition by the SAME key, so Spark plans ONE
exchange — the change-detection lag and the validity lead/version
windows reuse the partitioning and only re-sort within partitions
(verify in PLANS.md: q_scd2 shows a single shuffle). Consecutive
duplicate states collapse BEFORE the validity window, so version rows
are change-points only — at 100 TB the dim output is proportional to
the number of CHANGES, not the log size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def scd2(changes: DataFrame, key: str, ts_col: str, attr_col: str,
         tiebreak: str) -> DataFrame:
    """Build Type-2 dimension rows from an attribute change log.

    Returns (key, status, effective_from, effective_to, is_current,
    version): one row per observed attribute VALUE RUN, effective from
    its first observation until the next change (NULL effective_to and
    is_current=true on the latest). `tiebreak` makes same-timestamp
    ordering deterministic.
    """
    order = [F.col(ts_col), F.col(tiebreak)]
    w = W.partitionBy(key).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    starts = (
        changes.select(key, tiebreak, ts_col, attr_col)
        .withColumn("__prev", prev)
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
    )
    eff_to = F.lead(ts_col).over(w)
    return starts.select(
        key,
        F.col(attr_col).alias("status"),
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("effective_from"),
        F.date_format(eff_to, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("effective_to"),
        eff_to.isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
    )
