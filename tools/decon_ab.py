"""Interleaved A/B for q_decontaminate variants (measurement only).

A  = current registry build
B1 = pyarrow driver-side bloom index read (no Spark scan jobs)
B2 = B1 + fan_out(corpus) before shingling
B3 = B2 + broadcast hint on the hits side of the final anti join

    python tools/decon_ab.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aws_data_pipeline_ads_spark.catalog import load_table  # noqa: E402
from aws_data_pipeline_ads_spark.operators import bloom  # noqa: E402
from aws_data_pipeline_ads_spark.operators.dedup import doc_shingle_sets  # noqa: E402
from aws_data_pipeline_ads_spark.operators.partitioning import fan_out  # noqa: E402
from aws_data_pipeline_ads_spark.queries import REGISTRY  # noqa: E402
from aws_data_pipeline_ads_spark.queries.text_q import bloom_index  # noqa: E402
from aws_data_pipeline_ads_spark.session import get_session  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def bloom_read_fast(spark, path):
    import pyarrow.parquet as pq

    meta = pq.read_table(f"{path}/meta").to_pylist()[0]
    wtab = pq.read_table(f"{path}/words").to_pylist()
    words = spark.createDataFrame(
        [(r["widx"], r["w"]) for r in wtab], schema="widx int, w bigint")
    return (words, int(meta["m_bits"]), int(meta["n_hashes"]),
            (int(meta["fp_count"]), int(meta["fp_xor"])))


def build_variant(spark, sf_dir, *, fast_read, fanout, bcast):
    path = bloom_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 7)
    corpus = docs.filter(F.col("doc_id") % 101 != 7)

    rd = bloom_read_fast if fast_read else bloom.bloom_read
    words, m_bits, n_hashes, fp = rd(spark, path)
    live_sh = doc_shingle_sets(bench, k=5).select("tok").distinct()
    live_fp = bloom._value_fingerprint(live_sh, "tok")
    assert live_fp == fp
    corpus_for_sh = fan_out(corpus, "doc_id") if fanout else corpus
    corpus_sh = doc_shingle_sets(corpus_for_sh, k=5, distinct=False)
    candidates = bloom.bloom_prefilter(corpus_sh, "tok", words, m_bits, n_hashes)
    bench_j = (doc_shingle_sets(bench, k=5)
               .select(F.col("tok").alias("__bench_tok")).distinct())
    hits = (candidates.join(F.broadcast(bench_j),
                            F.col("tok") == F.col("__bench_tok"), "left_semi")
            .select(F.col("doc_id").alias("__hit_id")).distinct())
    if bcast:
        hits = F.broadcast(hits)
    return corpus.join(
        hits, F.col("doc_id") == F.col("__hit_id"), "left_anti"
    ).select("doc_id", "source")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("decon-ab")
    for _ in range(3):
        spark.range(3_000_000).selectExpr("sum(id)").write.mode(
            "overwrite").format("noop").save()

    arms = {
        "A_current": lambda: REGISTRY["q_decontaminate"].build(spark, sf_dir),
        "B1_pyarrow": lambda: build_variant(
            spark, sf_dir, fast_read=True, fanout=False, bcast=False),
        "B2_fanout": lambda: build_variant(
            spark, sf_dir, fast_read=True, fanout=True, bcast=False),
        "B3_bcast": lambda: build_variant(
            spark, sf_dir, fast_read=True, fanout=True, bcast=True),
    }
    times = {k: [] for k in arms}
    for rep in range(REPS):
        for k, fn in arms.items():
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        print(f"{k:12s} median {statistics.median(ts):6.3f}s  "
              f"({['%.2f' % t for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
