"""Per-query measurement harness for the optimization rounds (guide §1).

    python tools/profile_query.py plans [name ...]      # dump explain("formatted")
    python tools/profile_query.py time [name ...]       # min-of-N noop-forced timing
    python tools/profile_query.py both [name ...]       # plans then timing

Plans land in plans/<tag>/<name>_<suffix>.txt (tag default r13, suffix
default "before"; override with --tag/--suffix). Timing prints one line
per query: min / median of N samples plus Exchange and Python-eval node
counts from the formatted plan, so a plan-shape claim always has the
file to back it.
"""

from __future__ import annotations

import os
import re
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_counts(txt: str) -> str:
    ex = len(re.findall(r"\bExchange\b", txt))
    py = len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", txt))
    cart = len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", txt))
    smj = len(re.findall(r"SortMergeJoin", txt))
    bhj = len(re.findall(r"BroadcastHashJoin", txt))
    return f"ex={ex} py={py} nlj={cart} smj={smj} bhj={bhj}"


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    tag = "r13"
    suffix = "before"
    names = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--suffix":
            suffix = next(it)
        else:
            names.append(a)

    import __spark_entry__ as entry_mod
    from orientdb_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_query")
    qs = entry_mod.queries()
    if not names:
        import bench

        names = bench.HEADLINE
    plan_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(plan_dir, exist_ok=True)

    repeat = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEAT", "3"))
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = plan_text(df)
        if mode in ("plans", "both"):
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(txt)
        if mode in ("time", "both"):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            samples = []
            _force(qs[name](spark, sf_dir))  # warm-up, untimed
            for _ in range(repeat):
                t0 = time.perf_counter()
                _force(qs[name](spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            print(
                f"{name:38s} min={min(samples):7.3f} med={statistics.median(samples):7.3f}"
                f" n={repeat} {plan_counts(txt)}",
                flush=True,
            )
        else:
            print(f"{name:38s} {plan_counts(txt)}", flush=True)


if __name__ == "__main__":
    main()
