"""Same-session interleaved A/B for the r14 changes (guide §1: the host
throttles in bursts, so cross-window absolute numbers lie — only
interleaved minima on one session are comparable).

    python tools/ab_r14.py <case> [rounds]

Cases: classifier | curriculum | ivf_build | cc_final
Each round times OLD then NEW with the noop sink; prints per-variant
min after all rounds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    case = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from orientdb_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab_r14_{case}")

    if case == "classifier":
        from orientdb_spark.pipeline import model

        docs = entry_mod._classifier_label(entry_mod._docs(spark, sf_dir))

        def old():
            w = model.train_quality_classifier(
                docs, "__lbl", n_buckets=16, iters=3, lr=1.0
            )
            return model.classifier_score(docs, w)

        def new():
            return model.train_and_score_quality_classifier(
                docs, "__lbl", n_buckets=16, iters=3, lr=1.0
            )

    elif case == "curriculum":
        from orientdb_spark.pipeline.text import lm_score

        docs = entry_mod._docs(spark, sf_dir)

        def _scored(ckpt: bool):
            nll = lm_score(docs).select("doc_id", "nll")
            scored = (
                docs.select(F.col("doc_id"))
                .join(nll, on="doc_id", how="left")
                .select(
                    "doc_id", F.coalesce(F.col("nll"), F.lit(0.0)).alias("nll")
                )
            )
            return scored.localCheckpoint(eager=False) if ckpt else scored

        def _curriculum(scored, n_stages=3, n_shards=8, seed=0):
            from orientdb_spark.pipeline.common import h60

            qs = [s / n_stages for s in range(1, n_stages)]
            cuts = scored.agg(
                *[
                    F.round(
                        F.percentile(F.col("nll"), F.lit(q)) + F.lit(1e-12), 6
                    ).alias(f"__cut{i}")
                    for i, q in enumerate(qs)
                ]
            )
            stage = F.lit(n_stages - 1)
            for i in reversed(range(len(qs))):
                stage = F.when(
                    F.col("nll") <= F.col(f"__cut{i}"), F.lit(i)
                ).otherwise(stage)
            from pyspark.sql import Window

            keyed = (
                scored.crossJoin(F.broadcast(cuts))
                .withColumn("stage", stage.cast("int"))
                .withColumn(
                    "__k",
                    h60(F.concat(F.lit("curr:0:"), F.col("doc_id").cast("string"))),
                )
                .withColumn("shard", (F.col("__k") % F.lit(n_shards)).cast("int"))
            )
            w = Window.partitionBy("stage", "shard").orderBy(
                F.col("__k").asc(), F.col("doc_id").asc()
            )
            return keyed.select(
                "doc_id", "nll", "stage", "shard",
                (F.row_number().over(w) - 1).cast("long").alias("pos"),
            )

        def old():
            return _curriculum(_scored(False))

        def new():
            return _curriculum(_scored(True))

    elif case == "ivf_build":
        from orientdb_spark.pipeline import similarity as S

        embs = entry_mod._embs(spark, sf_dir)
        src = embs.filter(F.col("vec_id") % 2 == 0)
        tgt = embs.filter(F.col("vec_id") % 2 == 1)

        def _bitext_with_build(joined: bool):
            # reproduce bitext_mine(method='ivf') but force the index
            # build formulation
            real = S._ivf_centers

            if joined:
                orig_build = S.IvfIndex.build.__func__

                def join_build(cls, df, n_cells=None, vec_col="embedding",
                               id_col="vec_id", refine_iters=1, persist=True,
                               target_recall=0.6):
                    if n_cells is None:
                        n_cells, _ = S.derive_ivf_params(
                            max(1, df.count()), target_recall
                        )
                    centroids, assignments = S.build_ivf_index(
                        df, n_cells, vec_col, id_col, refine_iters
                    )
                    corpus = df.select(
                        F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("__cv"),
                    ).join(
                        assignments.withColumnRenamed(id_col, "neighbor_id"),
                        "neighbor_id",
                    )
                    return cls(centroids, corpus, id_col, n_cells=n_cells)

                S.IvfIndex.build = classmethod(join_build)
                try:
                    df = S.bitext_mine(
                        src, tgt, k=4, threshold=1.0, method="ivf",
                        k_candidates=8, refine_iters=0,
                    )
                    _force(df)
                finally:
                    S.IvfIndex.build = classmethod(orig_build)
            else:
                df = S.bitext_mine(
                    src, tgt, k=4, threshold=1.0, method="ivf",
                    k_candidates=8, refine_iters=0,
                )
                _force(df)

        def old():
            return ("ran", _bitext_with_build(True))[0]

        def new():
            return ("ran", _bitext_with_build(False))[0]

    elif case == "cc_final":
        from orientdb_spark.graph import tpch_graph

        def _cc(rev_union: bool):
            g = tpch_graph(entry_mod._engine(spark, sf_dir))
            e = (
                g.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .localCheckpoint(eager=True)
            )
            prev_sig = None
            it = 0
            while it < 50:
                e = g._large_star(e)
                e = g._small_star(e)
                it += 1
                if it < 3:
                    continue
                sig_row = e.agg(
                    F.sum(F.xxhash64("u", "v")).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                ).first()
                sig = (sig_row["s"], sig_row["n"])
                if sig == prev_sig:
                    break
                prev_sig = sig
            base = e
            if rev_union:
                base = e.unionByName(
                    e.select(F.col("v").alias("u"), F.col("u").alias("v"))
                )
            comp = base.groupBy("u").agg(F.min("v").alias("__nbr_min"))
            return (
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

        def old():
            return _cc(True)

        def new():
            return _cc(False)

    else:
        raise SystemExit(f"unknown case {case}")

    # warm both once
    for fn in (old, new):
        out = fn()
        if out is not None and out != "ran":
            _force(out)
    mins = {"old": None, "new": None}
    for r in range(rounds):
        for label, fn in (("old", old), ("new", new)):
            t0 = time.perf_counter()
            out = fn()
            if out is not None and out != "ran":
                _force(out)
            dt = time.perf_counter() - t0
            if mins[label] is None or dt < mins[label]:
                mins[label] = dt
            print(f"round {r} {label}: {dt:7.3f}s", flush=True)
    print(
        f"RESULT {case}: old_min={mins['old']:.3f}s new_min={mins['new']:.3f}s "
        f"speedup={mins['old'] / mins['new']:.2f}x"
    )


if __name__ == "__main__":
    main()
