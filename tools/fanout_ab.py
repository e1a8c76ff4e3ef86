"""A/B measure: current plan vs scan fan-out (repartition after read).

For each named query, times the registry build via the noop sink with
catalog.load_table unpatched (A) and patched to widen 1-task scans to
defaultParallelism (B), interleaved A B A B ... in one session.

    python tools/fanout_ab.py q_tpch_q1 q_image_gif ...

Measurement harness only — never imported by the engine.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_data_pipeline_ads_spark import catalog  # noqa: E402
from aws_data_pipeline_ads_spark.queries import REGISTRY  # noqa: E402
from aws_data_pipeline_ads_spark.session import get_session  # noqa: E402

REPS = 5

_orig = catalog.load_table


def _patched(spark, sf_dir, name):
    df = _orig(spark, sf_dir, name)
    if name in ("region", "nation", "supplier", "part", "customer"):
        return df  # broadcast-sized dims: widening is pure overhead
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        df = df.repartition(p)
    return df


def run_once(spark, name, sf_dir):
    t0 = time.time()
    REGISTRY[name].build(spark, sf_dir).write.mode("overwrite").format(
        "noop").save()
    return time.time() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_session("fanout-ab")
    # warm the JIT
    for _ in range(3):
        spark.range(3_000_000).selectExpr("sum(id)").write.mode(
            "overwrite").format("noop").save()
    for name in names:
        a_times, b_times = [], []
        for module in (catalog,):
            pass
        # interleave
        import aws_data_pipeline_ads_spark.queries.text_q as tq  # noqa
        for rep in range(REPS):
            catalog.load_table = _orig
            _repoint()
            a_times.append(run_once(spark, name, sf_dir))
            catalog.load_table = _patched
            _repoint()
            b_times.append(run_once(spark, name, sf_dir))
        catalog.load_table = _orig
        _repoint()
        a = statistics.median(a_times)
        b = statistics.median(b_times)
        print(f"{name:26s} A(current) {a:6.3f}s  B(fanout) {b:6.3f}s  "
              f"ratio {b/a:5.2f}  (A {['%.2f'%t for t in a_times]} "
              f"B {['%.2f'%t for t in b_times]})", flush=True)


def _repoint():
    """Query modules import load_table by name; repoint those refs."""
    import importlib
    for mod in ("text_q", "relational_q", "vector_q", "events_q",
                "scalar_q"):
        m = importlib.import_module(
            f"aws_data_pipeline_ads_spark.queries.{mod}")
        if hasattr(m, "load_table"):
            m.load_table = catalog.load_table


if __name__ == "__main__":
    main()
