"""Physical-plan introspection and scale-discipline assertions.

SURVEY.md §7 lists the 100 TB design rules (filters pushed to the scan,
columns pruned, bounded dims broadcast, no driver-side collect). Local
benches can't prove scale, so these helpers make the *plan shape*
testable — tests assert the plan we'd want on a 1000-executor cluster,
not just correct rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed/physical plan as text (AQE initial plan included)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, fragment: str | None = None) -> bool:
    """True if the parquet scan carries PushedFilters (optionally matching
    a fragment, e.g. a column name)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "[]" not in line.replace(" ", ""):
            if fragment is None or fragment in line:
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column-pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            body = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in body.split(",") if ":" in f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def uses_sort_merge_or_shuffled_hash(df: DataFrame) -> bool:
    p = physical_plan(df)
    return "SortMergeJoin" in p or "ShuffledHashJoin" in p


def count_shuffles(df: DataFrame) -> int:
    """Number of exchanges in the plan — the scale cost driver."""
    return physical_plan(df).count("Exchange ")


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Shuffle (hash/range-partitioning) exchanges only — broadcast
    exchanges excluded. Zero for a co-located bucketed join.

    Counts DISTINCT exchanges: a persisted subtree prints its
    InMemoryRelation cacheBuilder plan once per consumer, but those
    exchanges execute once (the cache materializes a single time) —
    identical normalized lines dedupe, so the count reflects runtime
    shuffles, not print repetition. Distinct real exchanges stay
    distinct via their expression IDs."""
    plan = physical_plan(df)
    seen = set()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            seen.add(line.lstrip(" :+-|*"))
    return len(seen)


def uses_take_ordered(df: DataFrame) -> bool:
    """ORDER BY + LIMIT should plan as TakeOrderedAndProject (k-heap per
    partition), never a global sort."""
    return "TakeOrderedAndProject" in physical_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """How many WholeStageCodegen spans the plan has (wider = better).
    The text plan marks codegen'd operators with `*(n)`."""
    import re

    plan = physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids) or plan.count("WholeStageCodegen")
