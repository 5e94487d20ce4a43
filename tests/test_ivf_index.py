"""IvfIndex build-once/query-many: after build, topk calls must run zero
centroid-build work (no seed collect, no Lloyd means, no re-assignment —
the persisted cell-assigned corpus is queried directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_spark.pipeline import similarity

SF_DIR = "/root/testdata/sf0.001"


def test_build_once_query_many(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    tracker = spark.sparkContext.statusTracker()
    q = embs.filter(F.col("vec_id") < 5)

    t0 = len(tracker.getJobIdsForGroup(None))
    idx = similarity.IvfIndex.build(embs, n_cells=8)
    r1 = sorted(map(tuple, idx.topk(q, k=3, nprobe=3).collect()))
    build_and_first = len(tracker.getJobIdsForGroup(None)) - t0

    t1 = len(tracker.getJobIdsForGroup(None))
    out = idx.topk(q, k=3, nprobe=3)
    r2 = sorted(map(tuple, out.collect()))
    second = len(tracker.getJobIdsForGroup(None)) - t1

    assert r2 == r1
    # the build runs its own jobs (seed collect, Lloyd means collect,
    # assignment + eager checkpoint); a repeat query must not repeat them —
    # it is strictly the probe/rerank query over the cached cells (AQE may
    # split that one query into a few jobs, but fewer than build+query)
    assert second < build_and_first, (second, build_and_first)
    # the queried plan reads the checkpointed corpus, not build lineage
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "posexplode" not in plan
    idx.unpersist()


def test_one_index_serves_topk_and_neardup(spark):
    """NOTES_r2 rough edge: one IvfIndex build must serve BOTH the ANN
    query path (topk) and near-dup mining (embedding_duplicate_pairs) —
    and sharing must not change the near-dup output, which is exact by
    ball-pruning regardless of the center set."""
    from orientdb_spark.pipeline import dedup

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 5)

    idx = similarity.IvfIndex.build(embs, n_cells=8)
    idx.topk(q, k=3, nprobe=3).collect()

    own = sorted(
        map(tuple, dedup.embedding_duplicate_pairs(embs, threshold=0.3).collect())
    )

    # the shared path must never touch the quantizer builder (that is the
    # whole point of sharing) — job-count deltas are AQE-noisy, so assert
    # the code path itself
    def _boom(*a, **k):
        raise AssertionError("shared-index path rebuilt the quantizer")

    orig = similarity.build_ivf_index
    similarity.build_ivf_index = _boom
    try:
        shared = sorted(
            map(
                tuple,
                dedup.embedding_duplicate_pairs(
                    embs, threshold=0.3, index=idx
                ).collect(),
            )
        )
    finally:
        similarity.build_ivf_index = orig

    assert shared == own and own  # exactness is center-set independent
    idx.unpersist()


def test_index_and_oneshot_agree(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 5)
    idx = similarity.IvfIndex.build(embs, n_cells=8)
    a = sorted(map(tuple, idx.topk(q, k=3, nprobe=3).collect()))
    b = sorted(
        map(
            tuple,
            similarity.ivf_topk(embs, q, k=3, n_cells=8, nprobe=3).collect(),
        )
    )
    assert a == b
    idx.unpersist()
