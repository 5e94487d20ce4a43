"""Jobs-per-evaluation counter (guide §1: measure first).

    python tools/count_jobs.py <name> [name ...]

For each query entry: construct the DataFrame (entry-construction driver
actions — seed collects, convergence probes, GD iterations — are jobs
too) and force it with the noop sink, then report how many Spark jobs
the whole evaluation submitted, split into construction-time vs
execution-time. Uses the status tracker's job id high-water mark, so it
needs no event-log plumbing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _max_job_id(sc) -> int:
    ids = sc.statusTracker().getJobIdsForGroup(None)
    return max(ids) if ids else -1


def main() -> None:
    names = sys.argv[1:]
    import __spark_entry__ as entry_mod
    from orientdb_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="count_jobs")
    sc = spark.sparkContext
    qs = entry_mod.queries()
    # warm-up so JVM/codegen jobs don't pollute the first count
    qs[names[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()
    for name in names:
        sc.setJobDescription(f"count_jobs:{name}")
        j0 = _max_job_id(sc)
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        j1 = _max_job_id(sc)
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        j2 = _max_job_id(sc)
        sc.setJobDescription(None)
        print(
            f"{name:38s} jobs_total={j2 - j0:3d} "
            f"(construct={j1 - j0:3d} in {t1 - t0:6.2f}s, "
            f"execute={j2 - j1:3d} in {t2 - t1:6.2f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
