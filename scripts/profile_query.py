"""Per-query profiling harness (guide §1: measure first).

Usage: python scripts/profile_query.py [--plans DIR] [--repeats N] q_name...

For each named query (bench registry = QUERIES + RAW_QUERIES):
- runs it through the noop sink ``repeats`` times (reports every wall
  and the min),
- counts the Spark jobs and stages it launched and sums task time
  (statusTracker — separates "many tiny jobs / round-trips" from
  "one slow stage"),
- optionally writes ``.explain('formatted')`` to DIR/<name>.txt.

Same session shape as bench.py (same env knobs, same warm-up) so the
numbers are comparable with the official bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    repeats = 3
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_dir = args[1]
            args = args[2:]
        elif args[0] == "--repeats":
            repeats = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bi_utils_spark import get_spark

    spark = get_spark("profile")
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

    tracker = sc.statusTracker()
    for name in names:
        fn = queries[name]
        walls = []
        jobs_used = stages_used = 0
        for r in range(repeats):
            before_jobs = set(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}#{r}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            walls.append(time.time() - t0)
            sc.setJobDescription(None)
            after_jobs = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = sorted(after_jobs - before_jobs)
            n_stages = 0
            task_ms = 0
            for j in new_jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                n_stages += len(ji.stageIds)
            jobs_used, stages_used = len(new_jobs), n_stages
            spark.catalog.clearCache()
        w = " ".join(f"{x:.2f}" for x in walls)
        print(
            f"{name}: min={min(walls):.2f}s  runs=[{w}]  "
            f"jobs={jobs_used} stages={stages_used}",
            flush=True,
        )
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
