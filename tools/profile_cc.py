"""Phase-level timing of graph_connected_components (r14 verdict item 1).

    python tools/profile_cc.py [repeats]

Steps _cc_two_phase manually at $SPARK_GRAFT_SF_DIR, timing each driver-
visible phase: graph construction, the init edge checkpoint, every
signature probe job (which materializes the pending star rounds), and
the final assembly noop. Prints per-phase seconds so the optimization
target is a measured job, not a guess.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from orientdb_spark import get_spark
    from orientdb_spark.graph import _CC_WARMUP, Graph, tpch_graph

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_cc")
    qs = entry_mod.queries()
    # warm-up: full entry once
    qs["graph_connected_components"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    for it in range(repeats):
        marks: list[tuple[str, float]] = []
        t0 = time.perf_counter()

        def mark(label: str) -> None:
            marks.append((label, time.perf_counter() - t0))

        eng = entry_mod._engine(spark, sf_dir)
        g = tpch_graph(eng)
        mark("tpch_graph()")
        e = (
            g.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .localCheckpoint(eager=True)
        )
        mark("init eager checkpoint")
        prev_sig = None
        rounds = 0
        while rounds < 50:
            e = g._large_star(e)
            e = g._small_star(e)
            rounds += 1
            if rounds < _CC_WARMUP:
                continue
            sig_row = e.agg(
                F.sum(F.xxhash64("u", "v")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ).first()
            mark(f"sig probe after alternation {rounds} (n={sig_row['n']})")
            sig = (sig_row["s"], sig_row["n"])
            if sig == prev_sig:
                break
            prev_sig = sig
        comp = e.groupBy("u").agg(F.min("v").alias("__nbr_min"))
        out = (
            g.vertices.select("vid")
            .join(comp.withColumnRenamed("u", "vid"), "vid", "left")
            .select(
                "vid",
                F.least(
                    F.col("vid"), F.coalesce("__nbr_min", F.col("vid"))
                ).alias("component"),
            )
            .groupBy("component")
            .agg(F.count(F.lit(1)).alias("n_vertices"))
        )
        out.write.mode("overwrite").format("noop").save()
        mark("final assembly noop")
        print(f"-- run {it}: total {marks[-1][1]:.3f}s")
        prev = 0.0
        for label, ts in marks:
            print(f"   {ts - prev:7.3f}s  {label}")
            prev = ts


if __name__ == "__main__":
    main()
