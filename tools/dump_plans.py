"""Dump `.explain("formatted")` for named queries → plans/r12/<q>_<tag>.txt.

Evidence artifacts for the optimization round: run once with tag
`before` at the start, and with tag `after` for each query touched.

    python tools/dump_plans.py <tag> q_name1 q_name2 ...
    python tools/dump_plans.py <tag> --all          # every declared query
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_data_pipeline_ads_spark.queries import REGISTRY  # noqa: E402
from aws_data_pipeline_ads_spark.session import get_session  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if names == ["--all"]:
        names = sorted(REGISTRY)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_session("dump-plans")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({tag})\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
