"""Interleaved A/B for winnow_pairs: pre-explode doc_id repartition.

A  = current registry build
B  = winnow_fingerprints with toked.repartition(P, doc_id) before the
     gram explode — shares the window's doc_id exchange (no extra
     shuffle), ships token arrays instead of gram rows, and the
     explicit partition count stops AQE from coalescing the stage to
     one task.

    python tools/winnow_ab.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from aws_data_pipeline_ads_spark.catalog import load_table  # noqa: E402
from aws_data_pipeline_ads_spark.operators import dedup  # noqa: E402
from aws_data_pipeline_ads_spark.operators.cache import (  # noqa: E402
    persist_tracked, release_caches,
)
from aws_data_pipeline_ads_spark.operators.dedup import (  # noqa: E402
    doc_token_arrays,
)
from aws_data_pipeline_ads_spark.queries import REGISTRY  # noqa: E402
from aws_data_pipeline_ads_spark.session import get_session  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 7


def winnow_fp_b(documents, k=4, w=4):
    spark = documents.sparkSession
    toked = doc_token_arrays(documents, "text")
    p = spark.sparkContext.defaultParallelism
    if toked.rdd.getNumPartitions() < p:
        toked = toked.repartition(p, "doc_id")
    t = F.col("__toks")
    grams = F.when(
        F.size(t) < k, F.array(F.array_join(t, " "))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (k - 1)),
            lambda i: F.array_join(F.slice(t, i, k), " "),
        )
    )
    g = toked.select("doc_id", F.posexplode(grams).alias("__i", "__gram"))
    g = g.select("doc_id", (F.col("__i") + 1).alias("pos"),
                 F.md5("__gram").alias("__gh"))
    fpk = F.concat(F.col("__gh"), F.lit("-"),
                   F.lpad(F.col("pos").cast("string"), 10, "0"))
    wd = W.partitionBy("doc_id")
    sel = (g.withColumn("__fpk", fpk)
           .withColumn("__sel", F.min("__fpk").over(
               wd.orderBy("pos").rowsBetween(0, w - 1)))
           .withColumn("n_grams", F.count(F.lit(1)).over(wd)))
    kept = sel.filter(
        F.col("pos") <= F.greatest(F.col("n_grams") - (w - 1), F.lit(1)))
    return (kept.select("doc_id",
                        F.col("n_grams").cast("long").alias("n_grams"),
                        F.col("__sel").alias("__fpk"))
            .distinct()
            .select("doc_id", "n_grams",
                    F.substring("__fpk", 1, 32).alias("h"),
                    F.substring("__fpk", 34, 10).cast("long").alias("pos")))


def pairs_b(documents, k=4, w=4, min_shared=2, max_df=1000):
    fp = persist_tracked(
        winnow_fp_b(documents, k=k, w=w).select("doc_id", "h").distinct())
    rare = (fp.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df).select("h"))
    fp = fp.join(rare, "h")
    fp = fp.withColumn(
        "n_fp", F.count(F.lit(1)).over(W.partitionBy("doc_id")).cast("long"))
    a, b = fp.alias("a"), fp.alias("b")
    overlap = F.col("n_shared").cast("double") / F.least(
        F.col("na"), F.col("nb")).cast("double")
    return (a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"),
                 F.max(F.col("a.n_fp")).alias("na"),
                 F.max(F.col("b.n_fp")).alias("nb"))
            .filter(F.col("n_shared") >= min_shared)
            .select("doc_a", "doc_b", "n_shared",
                    F.round(overlap, 6).alias("overlap")))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("winnow-ab")
    for _ in range(3):
        spark.range(3_000_000).selectExpr("sum(id)").write.mode(
            "overwrite").format("noop").save()
    arms = {
        "A_current": lambda: REGISTRY["q_winnow_pairs"].build(spark, sf_dir),
        "B_preexch": lambda: pairs_b(load_table(spark, sf_dir, "documents")),
    }
    # un-timed warm-up of both arms
    for fn in arms.values():
        fn().write.mode("overwrite").format("noop").save()
        release_caches()
    times = {k: [] for k in arms}
    for rep in range(REPS):
        order = list(arms) if rep % 2 == 0 else list(arms)[::-1]
        for k in order:
            t0 = time.time()
            arms[k]().write.mode("overwrite").format("noop").save()
            times[k].append(time.time() - t0)
            release_caches()
    for k, ts in times.items():
        print(f"{k:10s} median {statistics.median(ts):6.3f}s  "
              f"({['%.2f' % t for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
