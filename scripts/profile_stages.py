"""Stage-level profiling via the Spark event log (guide §1/§7).

Usage: python scripts/profile_stages.py q_name [q_name...]

Runs each query once warm through the noop sink with
spark.eventLog.enabled, then parses the event log and prints, per
stage: wall, summed task time, task count, shuffle bytes, and the
first line of the stage's callsite/name — the offline stand-in for
the Stages tab of a UI this sandbox can't serve.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events"


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from bi_utils_spark import get_spark

    spark = get_spark(
        "profile_stages",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    spark.range(1).count()
    from bi_utils_spark.sources.tables import load_table

    load_table(spark, sf_dir, "region").count()
    ncores = sc.defaultParallelism

    def _warm(batches):
        import numpy  # noqa: F401

        try:
            import bi_utils_spark.operators.multimodal  # noqa: F401
        except ImportError:
            pass
        yield from batches

    spark.range(ncores * 4, numPartitions=ncores).selectExpr(
        "CAST(id AS INT) AS x"
    ).mapInPandas(_warm, "x int").count()

    import __spark_entry__ as entry_mod
    from bi_utils_spark.entry_queries import RAW_QUERIES

    queries = entry_mod.queries()
    queries.update(RAW_QUERIES)

    spans = {}
    for name in names:
        fn = queries[name]
        # one warm run (not recorded) then the measured run
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        t0 = time.time()
        sc.setJobDescription(f"MEASURE:{name}")
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        sc.setJobDescription(None)
        spans[name] = (t0, time.time())
        spark.catalog.clearCache()
        print(f"== {name}: {spans[name][1]-t0:.2f}s wall", flush=True)

    app_id = sc.applicationId
    spark.stop()
    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):
        path = next(
            os.path.join(EVDIR, f) for f in os.listdir(EVDIR) if f.startswith(app_id)
        )

    # job id -> description; stage id -> info
    job_desc = {}
    job_stages = {}
    stage_meta = {}
    stage_tasks = {}
    with open(path) as fh:
        for line in fh:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                job_stages[jid] = [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])
                ]
                for s in ev.get("Stage Infos", []):
                    stage_meta[s["Stage ID"]] = s.get("Stage Name", "")
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                dur = (ti.get("Finish Time", 0) or 0) - (ti.get("Launch Time", 0) or 0)
                agg = stage_tasks.setdefault(
                    sid, {"n": 0, "ms": 0, "sr": 0, "sw": 0, "py": 0}
                )
                agg["n"] += 1
                agg["ms"] += dur
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                agg["sr"] += (srm.get("Local Bytes Read", 0) or 0) + (
                    srm.get("Remote Bytes Read", 0) or 0
                )
                agg["sw"] += swm.get("Shuffle Bytes Written", 0) or 0

    for name in names:
        print(f"\n===== {name} =====")
        tot_ms = 0
        rows = []
        for jid, desc in job_desc.items():
            if desc != f"MEASURE:{name}":
                continue
            for sid in job_stages.get(jid, []):
                agg = stage_tasks.get(sid)
                if not agg:
                    continue
                tot_ms += agg["ms"]
                rows.append((agg["ms"], sid, jid, agg))
        rows.sort(reverse=True)
        print(f"total task-ms={tot_ms}")
        for ms, sid, jid, agg in rows[:14]:
            nm = stage_meta.get(sid, "")[:110]
            print(
                f"  stage {sid} (job {jid}): {ms:6d} task-ms  n={agg['n']:3d}  "
                f"sr={agg['sr']>>10}KiB sw={agg['sw']>>10}KiB  {nm}"
            )


if __name__ == "__main__":
    main()
