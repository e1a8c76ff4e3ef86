"""Per-job wall-clock profile of one declared query via the Spark event log.

Replicates the bench child's environment (fresh JVM, same session config,
same warmup) but enables the event log, labels every rep, executes
cold + N steady reps, then parses the log into a per-job table:

    python tools/job_profile.py q_kmv_jaccard [reps]

Output (stderr): one line per job — rep label, job description, duration,
stage count, task count, max tasks per stage — plus a per-rep rollup.
This is the guide §1.1 empirical loop without the (disabled) UI.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

# code tree under test: $SPARK_GRAFT_TREE (default: this repo)
sys.path.insert(0, os.environ.get(
    "SPARK_GRAFT_TREE",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def run_once(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="spark_evlog_")

    # the engine's own session factory (so config changes there are
    # reflected here), with the event log bolted on via SparkConf
    # defaults BEFORE the factory builds the session
    from pyspark import SparkConf

    SparkConf()  # ensure pyspark initialized before setdefault hack
    extra = " ".join(
        f"--conf {c}" for c in os.environ.get(
            "SPARK_GRAFT_EXTRA_CONF", "").split(";") if c)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true "
        f"--conf spark.eventLog.dir={log_dir} "
        f"--conf spark.eventLog.compress=false "
        f"--conf spark.eventLog.rolling.enabled=false "
        f"{extra} pyspark-shell"
    )
    from aws_data_pipeline_ads_spark.session import get_session

    spark = get_session(f"profile-{name}")
    cpus = spark.sparkContext.defaultParallelism

    from aws_data_pipeline_ads_spark.catalog import load_table
    from aws_data_pipeline_ads_spark.operators.cache import release_caches
    from aws_data_pipeline_ads_spark.queries import REGISTRY

    # bench-child warmup (uncounted)
    run_once(spark.range(1_000_000).selectExpr("sum(id) AS s"))
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        run_once(load_table(spark, sf_dir, t).limit(1000))
    for wq in ("q_agg_rollup", "q_join_star", "q_window_rank"):
        if wq != name:
            for _ in range(2):
                run_once(REGISTRY[wq].build(spark, sf_dir))
    release_caches()
    spark.catalog.clearCache()

    qd = REGISTRY[name]
    sc = spark.sparkContext
    wall = {}
    sc.setJobDescription(f"REP0[{name}]")
    t0 = time.time()
    run_once(qd.build(spark, sf_dir))
    wall["REP0"] = round(time.time() - t0, 3)
    for i in range(1, reps + 1):
        release_caches()
        sc.setJobDescription(f"REP{i}[{name}]")
        t0 = time.time()
        run_once(qd.build(spark, sf_dir))
        wall[f"REP{i}"] = round(time.time() - t0, 3)
    sc.setJobDescription(None)
    spark.stop()

    # parse the event log (Spark 4 may write a rolled eventlog_v2 dir)
    files = []
    for entry in os.listdir(log_dir):
        p = os.path.join(log_dir, entry)
        if os.path.isdir(p):
            files += [os.path.join(p, f) for f in os.listdir(p)
                      if f.startswith("events_")]
        else:
            files.append(p)
    jobs: dict[int, dict] = {}
    stage_tasks: dict[int, int] = {}
    stage_name: dict[int, str] = {}
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "desc": props.get("spark.job.description", ""),
                        "t0": ev["Submission Time"],
                        "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    }
                    for s in ev["Stage Infos"]:
                        stage_name[s["Stage ID"]] = s.get("Stage Name", "")
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stage_tasks[si["Stage ID"]] = si.get("Number of Tasks", 0)

    per_rep: dict[str, float] = {}
    print(f"== {name} @ {sf_dir} cpus={cpus} ==", file=sys.stderr)
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        dur = (j["t1"] - j["t0"]) / 1000.0
        rep = j["desc"].split("[", 1)[0] if j["desc"].startswith("REP") else "-"
        per_rep[rep] = per_rep.get(rep, 0.0) + dur
        ntasks = sum(stage_tasks.get(s, 0) for s in j["stages"])
        ran = [s for s in j["stages"] if s in stage_tasks]
        tmax = max((stage_tasks[s] for s in ran), default=0)
        print(f"job {jid:>3} {rep:>5} {dur:7.3f}s  stages={len(ran)}/{len(j['stages'])}"
              f" tasks={ntasks:>4} maxTasks/stage={tmax:>3}  {j['desc'][:60]}",
              file=sys.stderr)
    print("-- per-rep: wall (sum of job durations)", file=sys.stderr)
    for rep in sorted(wall):
        print(f"{rep}: wall={wall[rep]:.3f}s jobs={per_rep.get(rep, 0.0):.3f}s",
              file=sys.stderr)
    print(json.dumps({"name": name, "wall": wall, "log_dir": log_dir}))


if __name__ == "__main__":
    main()
