"""Incrementally-maintained materialized aggregates over LakeTables.

The missing downstream half of the lakehouse tier: GROUP BY reporting
views over 100 TB source tables that a refresh keeps current WITHOUT
re-aggregating the world — the job Delta Live Tables / incremental
view maintenance does, pinned here engine-independently with the
classic counting algorithm (delta rules): every source row that
appeared contributes +1, every row that disappeared contributes -1,
changed rows contribute both, and the per-group running state absorbs
the signed delta. Aggregate classes, each with the maintenance that
class admits:

* COUNT / SUM / AVG (sum/count) — signed-delta incremental.
* VAR / STDDEV (`sumsq=`) — algebraic: signed Σm² rides the same
  deltas; VAR_POP = sumsq/n − (sum/n)².
* MIN / MAX (`minmax=`) — NOT invertible: delta-scoped partial
  recompute (only the delta's touched groups rescan).
* Star joins (`LakeJoinMaterializedView`) — fact ⋈ dim maintained on
  BOTH sides by Δ(F⋈D) = ΔF⋈D_new ∪ F_old⋈ΔD with broadcast deltas.

Charter scope (SURVEY §2C lakehouse family; the reference — a row-loop
Lambda ETL, lambda_function.py — has no views at all).

Scale shape:

* The delta between two source versions is FILE-PRUNED first: commits
  are immutable file lists, so files shared by both versions (under
  identical deferred-delete coverage) are never opened — a fixed-size
  append's refresh scans the appended files, not the table (measured
  in SCALE10X.md). What remains reduces to (key, group, measures, md5)
  BEFORE its one full-outer join — the exchange carries narrow rows,
  never document bodies; everything after the changed-key filter is
  delta-sized.
* Refresh spans are COMPACTION-AWARE (signed_span_delta): signed
  deltas compose additively, so the span folds into per-segment diffs
  that skip row-preserving compaction commits entirely — an OPTIMIZE
  landing between refreshes no longer destroys file pruning.
* The state table holds one row per group (tiny at any source size)
  and is itself a LakeTable: versioned, time-travelable, restorable,
  object-store-safe through the same CommitBackend seam.
* Refresh bookkeeping rides the commit log: each refresh commit
  carries txn_id "mv-refresh:<source_version>", so the view knows
  exactly which source version it reflects, a replayed refresh is
  answered from the log (exactly-once), and a concurrent refresher
  loses the exclusive-create like any other writer.

Exact arithmetic: sums are decimal(38,6) end to end (the repo's
dec-sum convention) — the incremental state is bit-identical to a
full GROUP BY recompute, which is precisely the invariant
q_lake_mv_refresh's oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_data_pipeline_ads_spark.lakelog import CommitBackend, LakeTable

_DEC = "decimal(38,6)"
_TXN_PREFIX = "mv-refresh:"
_JOIN_TXN_PREFIX = "mvj-refresh:"


# -- version-delta primitives (shared by single-table and join views) --------

def _file_pred_signatures(entry: dict) -> dict[str, tuple]:
    """file → canonical signature of the deferred-delete predicates
    covering it in this version (same scoping as LakeTable.read)."""
    import json as _json

    deferred = [d if "ranges" in d
                else {"ranges": d, "files": entry["files"]}
                for d in entry.get("deferred_deletes", [])]
    covers = [(set(d["files"]),
               _json.dumps(d["ranges"], sort_keys=True))
              for d in deferred]
    return {f: tuple(sorted(sig for fs, sig in covers if f in fs))
            for f in entry["files"]}


def _version_delta_sides(source: LakeTable, v_old: int, v_new: int):
    """The two version snapshots REDUCED to the files that differ.

    Commits are immutable file lists, so a file present in both
    versions under identical deferred-delete coverage contributes
    IDENTICAL rows to both sides — and with a per-snapshot-unique key,
    none of its keys can also appear in a differing file. Those files
    cancel out of the key-diff wholesale and are never opened: a
    fixed-size append's refresh scans the appended files, not the
    table (measured in SCALE10X.md — the property that makes
    incremental refresh viable at 100 TB). Files whose predicate
    coverage CHANGED (a deferred delete landed between the versions)
    stay in the diff on both sides."""
    e_old = source._read_entry(v_old)
    e_new = source._read_entry(v_new)
    sig_old = _file_pred_signatures(e_old)
    sig_new = _file_pred_signatures(e_new)
    prunable = {f for f in set(e_old["files"]) & set(e_new["files"])
                if sig_old[f] == sig_new[f]}

    def side(version: int, entry: dict) -> DataFrame:
        files = [f for f in entry["files"] if f not in prunable]
        if files:
            return source.read_version_files(version, files)
        return source.spark.createDataFrame(
            [], source.read(version).schema)

    return side(v_old, e_old), side(v_new, e_new)


def signed_version_delta(source: LakeTable, key: str, cols: list[str],
                         v_old: int, v_new: int) -> DataFrame:
    """Signed row delta between two versions of `source`: `cols` +
    __sign (+1 appeared / -1 disappeared). File-level pruning first
    (_version_delta_sides), then unchanged keys (same key, same
    content hash over `cols`) cancel out BEFORE any aggregation.

    The content hash is the JSON encoding of a struct, not a
    separator-joined concat: concat_ws cannot distinguish NULL from ''
    (both coalesce to the same bytes — a NULL→'' flip would slip past
    the delta), and values containing the separator could collide
    across columns. JSON escapes control characters and
    ignoreNullFields=false emits an explicit null, so the encoding is
    injective on the row."""
    content = F.md5(F.to_json(F.struct(*[F.col(c) for c in cols]),
                              {"ignoreNullFields": "false"}))
    old_side, new_side = _version_delta_sides(source, v_old, v_new)
    old = old_side.select(
        F.col(key).alias("__k"), *cols, content.alias("__h"))
    new = new_side.select(
        F.col(key).alias("__k"), *cols, content.alias("__h"))
    o, n = old.alias("o"), new.alias("n")
    j = o.join(n, F.col("o.__k") == F.col("n.__k"), "full_outer")
    changed_old = F.col("o.__k").isNotNull() & (
        F.col("n.__k").isNull() | (F.col("o.__h") != F.col("n.__h")))
    changed_new = F.col("n.__k").isNotNull() & (
        F.col("o.__k").isNull() | (F.col("o.__h") != F.col("n.__h")))
    minus = j.where(changed_old).select(
        *[F.col(f"o.{c}").alias(c) for c in cols],
        F.lit(-1).alias("__sign"))
    plus = j.where(changed_new).select(
        *[F.col(f"n.{c}").alias(c) for c in cols],
        F.lit(1).alias("__sign"))
    return minus.unionByName(plus)


def _sq_expr(m: str):
    """Exact-and-portable square: the double multiply is one IEEE op
    (bit-identical in any engine; measure magnitudes stay well under
    2^53), then one decimal(38,6) rounding — so signed sums of squares
    hash-match a DuckDB twin computing the same two steps."""
    d = F.col(m).cast("double")
    return (d * d).cast(_DEC)


def _nullsafe_eq(left: str, right: str, cols: list[str]):
    cond = None
    for g in cols:
        eq = F.col(f"{left}.{g}").eqNullSafe(F.col(f"{right}.{g}"))
        cond = eq if cond is None else cond & eq
    return cond


def signed_span_delta(source: LakeTable, key: str, cols: list[str],
                      v_old: int, v_new: int) -> DataFrame | None:
    """Signed delta over a multi-commit span, COMPACTION-AWARE.

    A compaction rewrites every file without changing effective rows
    (it even materializes pending deferred deletes — the parent's read
    applies the same predicates), so a single endpoint diff across one
    would find zero shared files and degenerate to a full two-snapshot
    scan whose rows all cancel: correct, but table-sized. Signed
    deltas compose additively — delta(a,c) ≡ delta(a,b) ⊎ delta(b,c) —
    so the span folds into per-segment diffs that SKIP row-preserving
    compaction commits entirely, keeping file pruning effective on
    every remaining segment. Returns None when every commit in the
    span is a compaction (no data change at all)."""
    segments: list[tuple[int, int]] = []
    a = v_old
    for v in range(v_old + 1, v_new + 1):
        if source._read_entry(v).get("op") == "compact":
            if v - 1 > a:
                segments.append((a, v - 1))
            a = v
    if v_new > a:
        segments.append((a, v_new))
    if not segments:
        return None
    out = None
    for lo, hi in segments:
        d = signed_version_delta(source, key, cols, lo, hi)
        out = d if out is None else out.unionByName(d)
    return out


def _delta_aggregate(delta: DataFrame, group_cols: list[str],
                     measures: list[str],
                     sumsq: list[str] | None = None) -> DataFrame:
    """Per-group signed aggregate of a delta: n_rows plus per-measure
    signed non-null count and decimal sum."""
    aggs = [F.sum("__sign").cast("long").alias("n_rows")]
    for m in measures:
        aggs.append(
            F.sum(F.when(F.col(m).isNotNull(), F.col("__sign"))
                  .otherwise(F.lit(0)))
            .cast("long").alias(f"n_{m}"))
        aggs.append(
            F.sum(F.col(m).cast(_DEC) * F.col("__sign"))
            .cast(_DEC).alias(f"sum_{m}"))
        if m in (sumsq or []):
            aggs.append(
                F.sum(_sq_expr(m) * F.col("__sign"))
                .cast(_DEC).alias(f"sumsq_{m}"))
    return delta.groupBy(*group_cols).agg(*aggs)


def _merge_group_state(state: DataFrame, d: DataFrame,
                       group_cols: list[str],
                       measures: list[str],
                       sumsq: list[str] | None = None) -> DataFrame:
    """state ⊕ delta, null-safe on the group key (a NULL group is a
    legal group); groups whose count hits zero drop out."""
    s, dd = state.alias("s"), d.alias("d")
    cond = None
    for g in group_cols:
        eq = F.col(f"s.{g}").eqNullSafe(F.col(f"d.{g}"))
        cond = eq if cond is None else cond & eq
    j = s.join(dd, cond, "full_outer")
    sel = [F.coalesce(F.col(f"s.{g}"), F.col(f"d.{g}")).alias(g)
           for g in group_cols]
    n_rows = (F.coalesce(F.col("s.n_rows"), F.lit(0))
              + F.coalesce(F.col("d.n_rows"), F.lit(0)))
    sel.append(n_rows.alias("n_rows"))
    for m in measures:
        c, k = f"sum_{m}", f"n_{m}"
        n_m = (F.coalesce(F.col(f"s.{k}"), F.lit(0))
               + F.coalesce(F.col(f"d.{k}"), F.lit(0)))
        sel.append(n_m.alias(k))
        merged = (F.coalesce(F.col(f"s.{c}"), F.lit(0).cast(_DEC))
                  + F.coalesce(F.col(f"d.{c}"), F.lit(0).cast(_DEC)))
        # SQL SUM over zero non-null values is NULL, not 0 — the
        # non-null count decides, exactly as a full recompute would
        sel.append(F.when(n_m == 0, F.lit(None).cast(_DEC))
                   .otherwise(merged).cast(_DEC).alias(c))
        if m in (sumsq or []):
            q = f"sumsq_{m}"
            merged_q = (F.coalesce(F.col(f"s.{q}"), F.lit(0).cast(_DEC))
                        + F.coalesce(F.col(f"d.{q}"), F.lit(0).cast(_DEC)))
            sel.append(F.when(n_m == 0, F.lit(None).cast(_DEC))
                       .otherwise(merged_q).cast(_DEC).alias(q))
    return j.select(*sel).where(F.col("n_rows") > 0)


class LakeMaterializedView:
    """A GROUP BY (count + exact sums) view over `source`, materialized
    as its own LakeTable at `path` and refreshed incrementally.

    State schema: group_cols..., n_rows long, then per measure
    n_<m> long (non-null count) and sum_<m> decimal(38,6), then per
    `minmax` measure min_<m>/max_<m> in the source column's type. The
    non-null count is load-bearing, not a convenience: SQL SUM over a
    group whose remaining values are all NULL is NULL, and a signed
    running sum alone cannot distinguish that from a legitimate 0 —
    sum_<m> is stored as NULL exactly when n_<m> is 0, keeping the
    state bit-identical to a full recompute. True AVG(m) is
    sum_<m>/n_<m> (per-column count, not n_rows). AVG itself is
    deliberately not stored — it would break additivity.

    MIN/MAX are NOT invertible — deleting a group's current extremum
    cannot be answered by any signed running value — so they are
    maintained by the standard fallback (Delta/DLT do the same):
    delta-scoped partial recompute. Each refresh recomputes min/max
    from the new source head for EXACTLY the groups present in the
    delta (a semi-join on the delta's distinct group set — delta-
    cardinality, broadcastable); untouched groups keep their stored
    extrema. Group stats in the commit log still prune the head scan
    where the group correlates with files; the worst case is one
    filtered scan of the head per refresh — still never a global
    re-aggregation, and exact by construction.
    """

    def __init__(self, spark: SparkSession, source: LakeTable, path: str,
                 key: str, group_cols: list[str], measures: list[str],
                 backend: CommitBackend | None = None,
                 minmax: list[str] | None = None,
                 sumsq: list[str] | None = None):
        # `key` must be unique per source snapshot (the table's primary
        # key — the same contract LakeTable.merge holds): the delta is
        # a key-based full-outer join, and duplicate keys would
        # multiply rows through it, corrupting the signed counts.
        if not group_cols:
            raise ValueError("materialized view needs >=1 group column")
        overlap = set(group_cols) & (set(measures) | set(minmax or []))
        if overlap:
            raise ValueError(f"columns cannot be both group and "
                             f"measure: {sorted(overlap)}")
        extra = set(sumsq or []) - set(measures)
        if extra:
            raise ValueError(
                f"sumsq columns must also be measures (variance needs "
                f"the sum and the non-null count): {sorted(extra)}")
        self.spark = spark
        self.source = source
        self.key = key
        self.group_cols = list(group_cols)
        self.measures = list(measures)
        self.minmax = list(minmax or [])
        self.sumsq = list(sumsq or [])
        self.table = LakeTable(spark, path, backend=backend)

    # -- bookkeeping ---------------------------------------------------------

    def last_refreshed(self) -> int | None:
        """The source version the current view state reflects (from the
        newest refresh commit's txn_id), or None if never built."""
        for h in reversed(self.table.history()):
            txn = h.get("txn_id") or ""
            if txn.startswith(_TXN_PREFIX):
                return int(txn[len(_TXN_PREFIX):])
        return None

    def read(self) -> DataFrame:
        return self.table.read()

    # -- aggregation shapes --------------------------------------------------

    def _sum_col(self, m: str) -> str:
        return f"sum_{m}"

    def _cnt_col(self, m: str) -> str:
        return f"n_{m}"

    def _full_aggregate(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for m in self.measures:
            aggs.append(F.count(F.col(m)).alias(self._cnt_col(m)))
            aggs.append(F.sum(F.col(m).cast(_DEC)).alias(self._sum_col(m)))
            if m in self.sumsq:
                aggs.append(F.sum(_sq_expr(m)).alias(f"sumsq_{m}"))
        for m in self.minmax:
            aggs.append(F.min(F.col(m)).alias(f"min_{m}"))
            aggs.append(F.max(F.col(m)).alias(f"max_{m}"))
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _delta_sides(self, v_old: int, v_new: int):
        return _version_delta_sides(self.source, v_old, v_new)

    def _delta(self, v_old: int, v_new: int) -> DataFrame:
        """Signed delta rows between two source versions: group cols +
        measures + sign (+1 appeared / -1 disappeared); see
        signed_version_delta."""
        cols = list(dict.fromkeys(self.group_cols + self.measures
                                  + self.minmax))
        return signed_version_delta(self.source, self.key, cols,
                                    v_old, v_new)

    # -- refresh -------------------------------------------------------------

    def refresh(self) -> int:
        """Bring the view up to the source head. First call builds the
        full aggregate; later calls apply only the signed delta since
        the last refresh. Returns the source version now reflected.
        Idempotent per source version (txn-guarded commit)."""
        head = self.source.current_version()
        if head is None:
            raise ValueError("source table has no commits to aggregate")
        last = self.last_refreshed()
        txn = f"{_TXN_PREFIX}{head}"
        if last is None:
            state = self._full_aggregate(self.source.read(head))
            self.table.commit(state, "overwrite", txn_id=txn)
            return head
        if last == head:
            return head
        if last > head:
            raise ValueError(
                f"view reflects source version {last}, but the source "
                f"head is {head} — source was restored/rewound past the "
                f"view; rebuild it (drop the view table) instead of "
                f"applying a negative-range delta")

        cols = list(dict.fromkeys(self.group_cols + self.measures
                                  + self.minmax))
        delta = signed_span_delta(self.source, self.key, cols,
                                  last, head)
        state = self.table.read()
        if delta is None:
            # the whole span is row-preserving compaction — no data
            # change; re-commit the state so the txn records head
            self.table.commit(state, "overwrite", txn_id=txn)
            return head
        d = self._full_aggregate_of_delta(delta)
        merged = self._merge_state(state, d)
        if self.minmax:
            merged = self._apply_minmax(merged, state, delta, head)
        self.table.commit(merged, "overwrite", txn_id=txn)
        return head

    def _full_aggregate_of_delta(self, delta: DataFrame) -> DataFrame:
        return _delta_aggregate(delta, self.group_cols, self.measures,
                                self.sumsq)

    def _nullsafe_group_eq(self, left: str, right: str):
        return _nullsafe_eq(left, right, self.group_cols)

    def _apply_minmax(self, merged: DataFrame, state: DataFrame,
                      delta: DataFrame, head: int) -> DataFrame:
        """Attach min_/max_ columns to the merged invertible state.

        Non-invertible extrema: recompute from the source head for
        exactly the groups the delta touched (delete a group's current
        MAX and no signed value can answer — only the group's surviving
        rows can), keep stored extrema everywhere else. `touched` and
        the recompute output are delta-/group-cardinality-sized, so
        both joins broadcast; the head scan is semi-join-filtered to
        touched groups."""
        touched = delta.select(*self.group_cols).distinct()
        src = self.source.read(head).alias("x")
        t = touched.alias("t")
        scoped = src.join(F.broadcast(t), self._nullsafe_group_eq("x", "t"),
                          "leftsemi")
        aggs = []
        for m in self.minmax:
            aggs.append(F.min(F.col(m)).alias(f"min_{m}"))
            aggs.append(F.max(F.col(m)).alias(f"max_{m}"))
        rec = (scoped.groupBy(*self.group_cols).agg(*aggs)
               .withColumn("__touched", F.lit(1)))
        mm_cols = [c for m in self.minmax for c in (f"min_{m}", f"max_{m}")]
        old = state.select(*self.group_cols, *mm_cols)
        # both broadcast sides are view-state-sized (one row per
        # group), never source-sized
        j = (merged.alias("m")
             .join(F.broadcast(old.alias("s")),
                   self._nullsafe_group_eq("m", "s"), "left")
             .join(F.broadcast(rec.alias("r")),
                   self._nullsafe_group_eq("m", "r"), "left"))
        sel = [F.col(f"m.{c}") for c in merged.columns]
        for c in mm_cols:
            # a surviving touched group always has a recompute row (it
            # exists in the head); an untouched group keeps its extrema
            sel.append(F.when(F.col("r.__touched").isNotNull(),
                              F.col(f"r.{c}"))
                       .otherwise(F.col(f"s.{c}")).alias(c))
        return j.select(*sel)

    def _merge_state(self, state: DataFrame, d: DataFrame) -> DataFrame:
        return _merge_group_state(state, d, self.group_cols,
                                  self.measures, self.sumsq)


class LakeJoinMaterializedView:
    """A GROUP BY (count + exact sums) view over FACT ⋈ DIM — the
    star-join reporting shape — materialized as its own LakeTable and
    refreshed incrementally on BOTH sides by the classic join delta
    rule (signed multisets):

        Δ(F ⋈ D) = ΔF ⋈ D_new  ∪  F_old ⋈ ΔD

    (expand (F_old+ΔF)⋈(D_old+ΔD) and cancel F_old⋈D_old; the ΔF⋈ΔD
    cross term is absorbed by joining ΔF against D at its NEW version).
    Each joined delta row carries its side's sign; the per-group state
    absorbs the signed aggregate exactly like the single-table view.

    Contracts: `fact_key` unique per fact snapshot, `join_key` unique
    per dim snapshot (many-to-one, INNER join) — the same uniqueness
    the delta's key-diff needs. Group/measure columns may come from
    either side (resolved against the schemas; ambiguous names refuse).

    Scale shape:
    * ΔF and ΔD are file-pruned version deltas (delta-sized for
      append-shaped revisions).
    * ΔF ⋈ D_new: the delta broadcasts; the dim side reads at head
      (dims are the small side of a star by construction).
    * F_old ⋈ ΔD: the delta broadcasts, so the fact side never
      shuffles — it scans once, filtered by the broadcast hash join
      to ΔD's join keys. A dim revision therefore costs one fact scan
      (no exchange); an unchanged dim costs nothing. This is the
      standard IVM trade (DBToaster/Materialize make the same one) —
      avoiding the scan entirely would need a join-key index over the
      fact files, which the commit log's per-file stats provide only
      when the fact is clustered by join key.
    * Refresh bookkeeping rides txn ids "mvj-refresh:<vF>:<vD>" —
      exactly-once per (fact, dim) version pair, replay answered from
      the log.
    """

    def __init__(self, spark: SparkSession, fact: LakeTable,
                 dim: LakeTable, path: str, fact_key: str, join_key: str,
                 group_cols: list[str], measures: list[str],
                 backend: CommitBackend | None = None,
                 minmax: list[str] | None = None,
                 sumsq: list[str] | None = None):
        if not group_cols:
            raise ValueError("materialized view needs >=1 group column")
        overlap = set(group_cols) & (set(measures) | set(minmax or []))
        if overlap:
            raise ValueError(f"columns cannot be both group and "
                             f"measure: {sorted(overlap)}")
        extra = set(sumsq or []) - set(measures)
        if extra:
            raise ValueError(
                f"sumsq columns must also be measures: {sorted(extra)}")
        self.spark = spark
        self.fact = fact
        self.dim = dim
        self.fact_key = fact_key
        self.join_key = join_key
        self.group_cols = list(group_cols)
        self.measures = list(measures)
        self.minmax = list(minmax or [])
        self.sumsq = list(sumsq or [])
        self.table = LakeTable(spark, path, backend=backend)

    # -- bookkeeping ---------------------------------------------------------

    def last_refreshed(self) -> tuple[int, int] | None:
        """(fact_version, dim_version) the current state reflects."""
        for h in reversed(self.table.history()):
            txn = h.get("txn_id") or ""
            if txn.startswith(_JOIN_TXN_PREFIX):
                vf, vd = txn[len(_JOIN_TXN_PREFIX):].split(":")
                return int(vf), int(vd)
        return None

    def read(self) -> DataFrame:
        return self.table.read()

    # -- column-side resolution ----------------------------------------------

    def _split_sides(self) -> tuple[list[str], list[str]]:
        """(fact-side, dim-side) partition of group+measure columns,
        resolved against the head schemas. The join key counts as a
        fact-side column (it exists on both; the join equates them)."""
        fact_cols = set(self.fact.read().columns)
        dim_cols = set(self.dim.read().columns)
        f_side, d_side = [], []
        for c in dict.fromkeys(self.group_cols + self.measures
                               + self.minmax):
            if c == self.join_key:
                f_side.append(c)
            elif c in fact_cols and c in dim_cols:
                raise ValueError(
                    f"column {c!r} exists in both fact and dim — rename "
                    f"one side before building the view")
            elif c in fact_cols:
                f_side.append(c)
            elif c in dim_cols:
                d_side.append(c)
            else:
                raise ValueError(f"column {c!r} in neither fact nor dim")
        return f_side, d_side

    # -- refresh -------------------------------------------------------------

    def _joined(self, f_df: DataFrame, d_df: DataFrame,
                broadcast_side: str | None = None) -> DataFrame:
        f_side, d_side = self._split_sides()
        f = f_df.select(self.join_key, *[c for c in f_side
                                         if c != self.join_key],
                        *(["__sign"] if "__sign" in f_df.columns else []))
        d = d_df.select(self.join_key, *d_side,
                        *(["__sign"] if "__sign" in d_df.columns else []))
        if broadcast_side == "fact":
            f = F.broadcast(f)
        elif broadcast_side == "dim":
            d = F.broadcast(d)
        return f.join(d, self.join_key, "inner")

    def refresh(self) -> tuple[int, int]:
        """Bring the view up to both source heads. First call builds
        the full join aggregate; later calls apply the signed join
        delta. Returns the (fact, dim) versions now reflected."""
        head_f = self.fact.current_version()
        head_d = self.dim.current_version()
        if head_f is None or head_d is None:
            raise ValueError("both sources need >=1 commit")
        last = self.last_refreshed()
        txn = f"{_JOIN_TXN_PREFIX}{head_f}:{head_d}"
        if last is None:
            state = self._full_aggregate(
                self._joined(self.fact.read(head_f),
                             self.dim.read(head_d), "dim"))
            self.table.commit(state, "overwrite", txn_id=txn)
            return head_f, head_d
        lf, ld = last
        if (lf, ld) == (head_f, head_d):
            return last
        if lf > head_f or ld > head_d:
            raise ValueError(
                f"view reflects (fact={lf}, dim={ld}) but heads are "
                f"(fact={head_f}, dim={head_d}) — a source was rewound "
                f"past the view; rebuild it (drop the view table)")

        f_side, d_side = self._split_sides()
        f_cols = list(dict.fromkeys([self.join_key] + f_side))
        d_cols = list(dict.fromkeys([self.join_key] + d_side))
        parts = []
        if head_f > lf:                       # ΔF ⋈ D_new
            d_f = signed_span_delta(self.fact, self.fact_key,
                                    f_cols, lf, head_f)
            if d_f is not None:
                parts.append(self._joined(d_f, self.dim.read(head_d),
                                          "fact"))
        if head_d > ld:                       # F_old ⋈ ΔD
            d_d = signed_span_delta(self.dim, self.join_key,
                                    d_cols, ld, head_d)
            if d_d is not None:
                parts.append(self._joined(self.fact.read(lf), d_d,
                                          "dim"))
        if not parts:
            # both spans are row-preserving compaction — no data change
            self.table.commit(self.table.read(), "overwrite",
                              txn_id=txn)
            return head_f, head_d
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        d = _delta_aggregate(delta, self.group_cols, self.measures,
                             self.sumsq)
        state = self.table.read()
        merged = _merge_group_state(state, d, self.group_cols,
                                    self.measures, self.sumsq)
        if self.minmax:
            merged = self._apply_minmax(merged, state, delta,
                                        head_f, head_d)
        self.table.commit(merged, "overwrite", txn_id=txn)
        return head_f, head_d

    def _full_aggregate(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for m in self.measures:
            aggs.append(F.count(F.col(m)).alias(f"n_{m}"))
            aggs.append(F.sum(F.col(m).cast(_DEC)).alias(f"sum_{m}"))
            if m in self.sumsq:
                aggs.append(F.sum(_sq_expr(m)).alias(f"sumsq_{m}"))
        for m in self.minmax:
            aggs.append(F.min(F.col(m)).alias(f"min_{m}"))
            aggs.append(F.max(F.col(m)).alias(f"max_{m}"))
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _apply_minmax(self, merged: DataFrame, state: DataFrame,
                      delta: DataFrame, head_f: int,
                      head_d: int) -> DataFrame:
        """Join-view extrema: delta-scoped partial recompute over the
        CURRENT join (F_head ⋈ D_head semi-filtered to the delta's
        touched groups — a dim re-pointing moves whole groups, and the
        signed delta carries rows for both the drained and the filled
        group, so `touched` covers both). Untouched groups keep stored
        extrema; same select logic as the single-table view."""
        touched = delta.select(*self.group_cols).distinct()
        joined = self._joined(self.fact.read(head_f),
                              self.dim.read(head_d), "dim").alias("x")
        scoped = joined.join(F.broadcast(touched.alias("t")),
                             _nullsafe_eq("x", "t", self.group_cols),
                             "leftsemi")
        aggs = []
        for m in self.minmax:
            aggs.append(F.min(F.col(m)).alias(f"min_{m}"))
            aggs.append(F.max(F.col(m)).alias(f"max_{m}"))
        rec = (scoped.groupBy(*self.group_cols).agg(*aggs)
               .withColumn("__touched", F.lit(1)))
        mm_cols = [c for m in self.minmax
                   for c in (f"min_{m}", f"max_{m}")]
        old_mm = state.select(*self.group_cols, *mm_cols)
        j = (merged.alias("m")
             .join(F.broadcast(old_mm.alias("s")),
                   _nullsafe_eq("m", "s", self.group_cols), "left")
             .join(F.broadcast(rec.alias("r")),
                   _nullsafe_eq("m", "r", self.group_cols), "left"))
        sel = [F.col(f"m.{c}") for c in merged.columns]
        for c in mm_cols:
            sel.append(F.when(F.col("r.__touched").isNotNull(),
                              F.col(f"r.{c}"))
                       .otherwise(F.col(f"s.{c}")).alias(c))
        return j.select(*sel)


def lake_mv_sink(stream_df: DataFrame, view: LakeMaterializedView,
                 checkpoint_dir: str,
                 app_id: str | None = None) -> None:
    """Streaming ingest that keeps a materialized view CURRENT: each
    micro-batch appends to the view's source table (query-scoped txn —
    exactly-once, lakelog._run_scoped_sink) and then refreshes the
    view incrementally. A crash between the append and the refresh
    self-heals: refresh() is idempotent per source version (its commit
    txn is keyed by the version it reflects), so the next batch — or
    the next drain — applies the missing delta and nothing else. The
    end-to-end contract a 100 TB landing-table + reporting-view pair
    needs from one checkpointed query."""
    from aws_data_pipeline_ads_spark.lakelog import _run_scoped_sink

    def commit_and_refresh(batch: DataFrame, bid: int, aid: str) -> None:
        view.source.commit(batch, "append",
                           txn_id=f"{aid}:mv-append-{bid}", retries=3)
        view.refresh()

    _run_scoped_sink(stream_df, checkpoint_dir, commit_and_refresh, app_id)
