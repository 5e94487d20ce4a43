"""Similarity search over embedding columns (array<float>).

Three paths:
- brute_force_topk: exact cosine top-k — the correctness baseline; the
  query side is broadcast, the corpus side streams, ranking is a
  per-query window (TakeOrdered shape). O(Q × N) but one scan of N.
- lsh_topk: random-hyperplane LSH bucketing + exact rerank within probed
  buckets. Hyperplanes are derived from the md5-based h60 hash so the
  index is deterministic (no RNG state), and bucket ids are computed per
  row with no shuffle; only the candidate rerank joins.
- ivf_topk: inverted-file index — deterministic seed centroids + one
  Lloyd refinement, corpus partitioned into cells, queries probe the
  ``nprobe`` nearest cells and rerank exactly. At 100 TB the cell
  assignment is the partition key: a probe touches nprobe/ncells of the
  corpus.

Approximate paths (recall < 1) → no SQL oracle; the driver records the
rows-only check, and tests measure recall against brute force instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from orientdb_spark.pipeline.common import cosine_similarity, h60, vec_norm


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank), self-matches excluded,
    ties broken by neighbor id (deterministic for the oracle).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv")
    ).withColumn("__qn", vec_norm(F.col("__qv")))
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("__cv")
    ).withColumn("__cn", vec_norm(F.col("__cv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            cosine_similarity(
                F.col("__qv"), F.col("__cv"), norm_a=F.col("__qn"), norm_b=F.col("__cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _assign_udf(centers: list[list[float]]):
    """Arrow-vectorized cell assignment: per batch, one (B×d)·(d×K) numpy
    matmul against the (driver-small, closure-captured) centroid matrix,
    argmax by cosine with ties to the lower cid — the scale path for
    assignment: a narrow map stage, NO shuffle, no per-row interpreted
    higher-order functions. ~n_cells·d doubles ride along with the task
    like a broadcast variable."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centers, dtype=np.float64)  # K × d
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0.0] = 1.0

    @pandas_udf("long")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if M.size == 0:
            return pd.Series([], dtype="int64")
        Mn = np.linalg.norm(M, axis=1)
        Mn[Mn == 0.0] = 1.0
        sims = (M @ C.T) / np.outer(Mn, Cn)
        # argmax keeps the FIRST max → ties resolve to the lower cid,
        # matching the former row_number(orderBy sim desc, cid) semantics
        return pd.Series(np.argmax(sims, axis=1).astype("int64"))

    return assign


def seed_centers(corpus: DataFrame, n_cells: int) -> list[list[float]]:
    """Deterministic quantizer seeds: the ``n_cells`` corpus vectors with
    the smallest h60(id) — uniformly spread, no RNG state. ``corpus`` is
    the normalized (__id, __v) projection. Shared by build_ivf_index and
    dedup.embedding_duplicate_pairs so both quantize identically."""
    seed_rows = (
        corpus.withColumn("__h", h60(F.col("__id").cast("string")))
        .orderBy("__h")
        .limit(n_cells)
        .select("__v")
        .collect()
    )
    return [list(r["__v"]) for r in seed_rows]


def build_ivf_index(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_iters: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer. Returns (centroids(cid, cvec),
    assignments(id, cid)) — the inverted file.

    Seeds are the ``n_cells`` corpus vectors with the smallest h60(id)
    (deterministic, uniformly spread); ``refine_iters`` Lloyd steps
    re-center each cell at the element-wise mean of its members. The
    centroid set is tiny (n_cells × dim doubles), so it lives driver-side:
    assignment is a vectorized numpy argmax per Arrow batch (narrow map,
    zero shuffle) instead of a crossJoin + window — per Lloyd step the
    only shuffle is the element-wise-mean groupBy."""
    corpus = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    centers = seed_centers(corpus, n_cells)

    for _ in range(refine_iters):
        assigned = corpus.withColumn("cid", _assign_udf(centers)(F.col("__v")))
        mean_rows = (
            assigned.select("cid", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        centers = [
            [vals[p] for p in sorted(vals)]
            for _, vals in sorted(by_cid.items())
        ]

    spark = df.sparkSession
    centroids = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], ["cid", "cvec"]
    )
    assignments = corpus.withColumn("cid", _assign_udf(centers)(F.col("__v"))).select(
        F.col("__id").alias(id_col), "cid"
    )
    return centroids, assignments


class IvfIndex:
    """Persisted IVF index handle — build once, query many.

    ``build`` materializes the centroids (localCheckpoint) and the
    cell-assigned corpus (persisted, eagerly computed), so subsequent
    ``topk`` calls run zero centroid-build jobs: probing joins against the
    cached cell-partitioned corpus directly. At 100 TB this is the
    difference between an index and a per-query table scan — the build is
    one pass, every query after touches ~nprobe/n_cells of the corpus.

    Parameter guidance (measured, BENCH.md sf1 ANN study): on an
    unstructured (isotropic) corpus recall tracks nprobe/n_cells almost
    linearly (cells=16/nprobe=8 -> 0.77 recall@10 over 20k vectors;
    cells=64/nprobe=16 -> 0.62 at 2.3x the speed) — pick the ratio to
    match the recall floor you need; clustered real-model embeddings
    sit far above these floors at the same settings.
    """

    def __init__(self, centroids: DataFrame, corpus_cells: DataFrame, id_col: str):
        self.centroids = centroids
        self.corpus_cells = corpus_cells  # (neighbor_id, __cv, cid), persisted
        self.id_col = id_col

    @classmethod
    def build(
        cls,
        df: DataFrame,
        n_cells: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        refine_iters: int = 1,
        persist: bool = True,
    ) -> "IvfIndex":
        """``persist=True`` (the query-many path) materializes the
        cell-assigned corpus so later ``topk`` calls run zero build jobs;
        ``persist=False`` keeps it lazy for one-shot use."""
        centroids, assignments = build_ivf_index(df, n_cells, vec_col, id_col, refine_iters)
        corpus = df.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        ).join(assignments.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
        if persist:
            corpus = corpus.localCheckpoint(eager=True)  # cut lineage; cache cells
        return cls(centroids, corpus, id_col)

    def topk(self, queries: DataFrame, k: int = 5, nprobe: int = 4,
             vec_col: str = "embedding") -> DataFrame:
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("__qv"),
        )
        wq = Window.partitionBy("query_id").orderBy(F.col("__d").desc(), F.col("cid"))
        probes = (
            q.crossJoin(F.broadcast(self.centroids))
            .withColumn("__d", cosine_similarity(F.col("__qv"), F.col("cvec")))
            .withColumn("__r", F.row_number().over(wq))
            .filter(F.col("__r") <= nprobe)
            .select("query_id", "__qv", "cid")
        )
        scored = (
            F.broadcast(probes)
            .join(self.corpus_cells, "cid")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("cosine", cosine_similarity(F.col("__qv"), F.col("__cv")))
        )
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
        )

    def unpersist(self) -> None:
        self.corpus_cells.unpersist()


def kmeans(
    df: DataFrame,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Spherical k-means (cosine-assignment Lloyd) over an embedding
    column — the corpus-clustering step behind cluster-balanced sampling
    and topic-level dedup. Returns (centroids(cid, cvec),
    assignments(id, cid)).

    This is the IVF coarse quantizer loop exposed as a public operator:
    deterministic h60-seeded centers (no RNG), per-iteration cost = one
    narrow Arrow matmul assignment (no shuffle) + one element-wise-mean
    groupBy; the centroid set stays driver-side, k*dim-bounded. Empty
    cells drop out and the surviving cids renumber densely. The result
    is gated against a pure-numpy Lloyd reference in
    tests/test_ivf_index.py (rows-only in the driver: the mean-update
    sums floats in partition order, so last-ulp centroid wiggle makes a
    cross-engine hash oracle the wrong check)."""
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got k={k}, iters={iters}")
    return build_ivf_index(
        df, n_cells=k, vec_col=vec_col, id_col=id_col, refine_iters=iters
    )


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: IvfIndex | None = None,
) -> DataFrame:
    """Approximate top-k through the IVF index: each query probes its
    ``nprobe`` closest cells; exact cosine rerank within those cells.
    Same output shape as brute_force_topk. Pass a prebuilt ``index``
    (IvfIndex.build) to skip the per-call build — the build-once/query-many
    path every repeated-query workload should use."""
    if index is None:
        index = IvfIndex.build(df, n_cells, vec_col, id_col, persist=False)
    return index.topk(queries, k=k, nprobe=nprobe, vec_col=vec_col)


def _hyperplane(dim: int, plane: int, table: int = 0) -> list[float]:
    """Deterministic pseudo-random hyperplane component from the shared
    60-bit hash family — reproducible across runs/engines, no RNG.
    ``table`` salts the family so multi-table LSH gets independent plane
    sets; table 0 keeps the original key (signature stability)."""
    import hashlib

    salt = f"plane:{plane}:" if table == 0 else f"plane:t{table}:{plane}:"
    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"{salt}{j}".encode()).hexdigest()[:15], 16)
        out.append((h / float(1 << 60)) * 2.0 - 1.0)
    return out


def lsh_bucket_col(vec: Column, dim: int, planes: int, table: int = 0) -> Column:
    """Random-hyperplane signature: bit p = sign(v · plane_p)."""
    v = vec.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        coeffs = _hyperplane(dim, p, table)
        dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(c) for c in coeffs]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_probe_buckets(
    vec: Column, dim: int, planes: int, nprobe: int, table: int = 0
) -> Column:
    """Multi-probe bucket list for a query vector (Lv et al., "Multi-Probe
    LSH", VLDB'07): the vector's own bucket plus the ``nprobe - 1`` buckets
    reached by flipping the sign bits with the smallest margin |v·plane|
    — the planes the vector sits closest to, i.e. where a true neighbor
    most likely landed on the other side. Pure Column (array_sort over
    (margin, plane) structs), deterministic, computed per query row with
    no shuffle; the corpus side still stores exactly one bucket per row,
    so the index itself doesn't grow — only the query fan-out does."""
    v = vec.cast("array<double>")
    dots = []
    for p in range(planes):
        coeffs = _hyperplane(dim, p, table)
        dots.append(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(c) for c in coeffs]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    base = F.lit(0).cast("long")
    for p, dot in enumerate(dots):
        base = base + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    ranked = F.array_sort(
        F.array(*[
            F.struct(F.abs(dot).alias("m"), F.lit(p).alias("p"))
            for p, dot in enumerate(dots)
        ])
    )
    pow2 = F.array(*[F.lit(2 ** p).cast("long") for p in range(planes)])
    flips = F.transform(
        F.slice(ranked, 1, max(nprobe - 1, 0)),
        lambda s: base.bitwiseXOR(F.element_at(pow2, s["p"] + 1)),
    )
    return F.concat(F.array(base), flips)


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    planes: int = 8,
    nprobe: int = 1,
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's ``nprobe``
    probed LSH buckets (own bucket + lowest-margin bit flips — multi-probe
    raises recall without touching the corpus-side index); exact cosine
    rerank within candidates. Same output shape as brute_force_topk;
    recall measured in tests.

    ``tables > 1`` builds that many independent hash tables (plane sets
    salted per table, see ``_hyperplane``) and unions their candidates —
    the classic recall lever: a true neighbor is found if it collides in
    ANY table, so miss probability decays exponentially in T. Cost model
    at scale: the corpus emits T bucket entries per row (one scan — the
    tables ride in one exploded array, not T passes) and the candidate
    set grows ~T×; the exact rerank still runs once per distinct
    (query, candidate) thanks to the dropDuplicates below.

    Parameter guidance (measured, BENCH.md sf1 ANN study): on an
    UNSTRUCTURED (isotropic) corpus recall tracks the probed fraction of
    the corpus, so keep buckets populated as N grows — choose
    ``planes ~ log2(N / desired_bucket_size)`` (8 planes over 20k
    vectors leaves ~80 per bucket and recall@10 collapsed to 0.05 at
    defaults; planes=4 recovered 0.54 at 3x brute-force speed). Real
    embedding corpora are clustered and sit far above these floors at
    the same settings."""
    # one flat bucket keyspace across tables: key = (table << planes) | bucket
    c_buckets = F.array(
        *[
            lsh_bucket_col(F.col(vec_col), dim, planes, table=t)
            + F.lit(t << planes).cast("long")
            for t in range(tables)
        ]
    )
    def _shifted_probes(t: int) -> Column:
        # NB: a two-arg lambda in F.transform would receive the element
        # INDEX as its second argument — keep the table offset in a closure
        off = F.lit(t << planes).cast("long")
        return F.transform(
            lsh_probe_buckets(F.col(vec_col), dim, planes, nprobe, table=t),
            lambda b: b + off,
        )

    q_buckets = F.concat(*[_shifted_probes(t) for t in range(tables)])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        F.explode(q_buckets).alias("__b"),
    ).withColumn("__qn", vec_norm(F.col("__qv")))
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv"),
        F.explode(c_buckets).alias("__b"),
    ).withColumn("__cn", vec_norm(F.col("__cv")))
    scored = (
        F.broadcast(q)
        .join(c, "__b")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # multi-probe can reach the same neighbor via several probed
        # buckets — dedup before ranking or row_number double-counts
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cosine",
            cosine_similarity(
                F.col("__qv"), F.col("__cv"), norm_a=F.col("__qn"), norm_b=F.col("__cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid (element-wise mean vector) + member count —
    the class-prototype aggregate behind nearest-centroid classification
    and per-class drift monitoring. Returns (label, n_members, centroid).

    One posexplode (linear) and one (label, pos) groupBy with map-side
    partial means; the re-assembly groupBy collects label-count x dim
    rows — tiny — so no corpus-sized second shuffle."""
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    )
    dims = ex.groupBy("label", "pos").agg(
        F.avg("x").alias("m"), F.count(F.lit(1)).alias("n")
    )
    return dims.groupBy("label").agg(
        F.max("n").alias("n_members"),
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("m")))
        ).getField("m").alias("centroid"),
    )


def nearest_centroid_confusion(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid classification self-evaluation: assign every
    vector to its highest-cosine class prototype (label_centroids) and
    cross-tabulate against the true label — the confusion matrix that
    tells you whether an embedding space separates its classes at all.
    Returns (label, predicted, n).

    The centroid table is k rows and broadcasts; assignment is a
    k-fan-out narrow join + one (vec, centroid)-cosine per pair, argmax
    via struct-max with the 6-dp-rounded score (cross-engine FP
    discipline) and the label as tiebreak. One corpus-sized groupBy."""
    from orientdb_spark.pipeline.common import cosine_similarity

    cents = label_centroids(df, label_col=label_col, vec_col=vec_col).select(
        F.col("label").alias("__clabel"), F.col("centroid")
    )
    vec = F.col(vec_col).cast("array<double>")
    scored = df.select(
        F.col(id_col), F.col(label_col).alias("label"), vec.alias("__v")
    ).crossJoin(F.broadcast(cents))
    score = F.round(cosine_similarity(F.col("__v"), F.col("centroid")), 6)
    best = (
        scored.groupBy(id_col, "label")
        .agg(
            F.max(
                F.struct(score.alias("s"), (-F.col("__clabel")).alias("nl"))
            ).alias("__w")
        )
        .select("label", (-F.col("__w.nl")).cast("int").alias("predicted"))
    )
    return best.groupBy("label", "predicted").agg(F.count(F.lit(1)).alias("n"))
