"""Embedding scalar quantization (float -> b-bit codes).

Per-dimension min/max scalar quantization — the standard 4-8x storage
cut for embedding corpora before ANN indexing (float64 -> uint8 codes
plus a dim-sized scale table).

Shape at scale: the per-dim stats aggregate is the only shuffle and its
output is dim-bounded (64 rows here, 4k for a big model — the same
bounded-collect discipline as the IVF centroid pull); code assignment
is then a narrow per-row ``transform`` against the broadcast-literal
scale arrays — zero additional exchanges, no explode of the corpus.

Determinism: the quantization math is sub/mul/div/floor only — IEEE
ops that are correctly rounded and therefore bit-identical across
engines (unlike ln/exp library calls), so a SQL oracle can reproduce
codes and reconstruction errors exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "scalar_quantize",
    "pca_fit",
    "pca_project",
    "pq_fit",
    "pq_encode",
    "pq_encode_udf",
    "pq_topk",
    "pq_query_lut_udf",
    "pq_adc_score",
]


def scalar_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Quantize ``vec_col`` to per-dim b-bit codes. Returns
    ``(id, codes array<int>, max_abs_err double)`` where
    ``code = clamp(floor((x - mn_d) / (mx_d - mn_d) * 2^bits), 0, 2^bits - 1)``
    and the error is against midpoint reconstruction
    ``mn_d + (code + 0.5) * (mx_d - mn_d) / 2^bits``.

    A constant dimension (mx == mn) codes to 0 with zero error.
    """
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    levels = 2 ** bits
    vec = F.col(vec_col).cast("array<double>")

    stats = (
        df.select(F.posexplode(vec).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("pos")
        .collect()  # dim-bounded (one row per vector dimension)
    )
    if not stats:
        raise ValueError("cannot quantize an empty corpus (no per-dim stats)")
    mns = [r["mn"] for r in stats]
    mxs = [r["mx"] for r in stats]
    mn_a, mx_a = F.lit(mns), F.lit(mxs)

    def _at(arr, i):
        return F.element_at(arr, (i + F.lit(1)).cast("int"))

    def _code(x, i):
        mn, mx = _at(mn_a, i), _at(mx_a, i)
        raw = F.floor((x - mn) / (mx - mn) * F.lit(levels))
        return (
            F.when(mx == mn, F.lit(0))
            .otherwise(F.greatest(F.least(raw, F.lit(levels - 1)), F.lit(0)))
            .cast("int")
        )

    def _err(x, i):
        mn, mx = _at(mn_a, i), _at(mx_a, i)
        recon = mn + (_code(x, i).cast("double") + F.lit(0.5)) * (mx - mn) / F.lit(
            levels
        )
        return F.abs(x - recon)

    return df.select(
        F.col(id_col),
        F.transform(vec, _code).alias("codes"),
        F.array_max(F.transform(vec, _err)).alias("max_abs_err"),
    )


def _rp_sign(seed: int, i: int, j: int) -> int:
    """Driver-side twin of pipeline/common.h60's md5 path: the (i, j)
    entry of the sign matrix is a pure function of the seed."""
    import hashlib

    h = int(hashlib.md5(f"{seed}:rp:{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def sign_random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dim: int = 64,
    out_dim: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Dimensionality reduction by a deterministic ±1 random projection
    (Achlioptas 2003 sign matrix; the Johnson-Lindenstrauss workhorse):
    ``y_j = (1/sqrt(out_dim)) * Σ_i x_i * s(i, j)`` with the sign matrix
    derived from md5 arithmetic — reproducible across runs AND engines,
    unlike randn()-seeded matrices. Returns (id, proj array<double>).

    The matrix rides in as ``out_dim`` literal arrays; each projection
    is the same sequential-fold dot product the cosine oracles use, so
    DuckDB's list_dot_product reproduces every component bit-for-bit.
    Pure narrow projection: zero shuffles, O(in_dim * out_dim) per row —
    the 100 TB shape for shrinking an embedding column before ANN or
    clustering."""
    from orientdb_spark.pipeline.common import dot_product

    if in_dim <= 0 or out_dim <= 0:
        raise ValueError(f"dims must be positive, got {in_dim}, {out_dim}")
    vec = F.col(vec_col).cast("array<double>")
    scale = 1.0 / (out_dim ** 0.5)
    cols = []
    for j in range(out_dim):
        signs = [float(_rp_sign(seed, i, j)) for i in range(in_dim)]
        cols.append(dot_product(vec, F.lit(signs)) * F.lit(scale))
    return df.select(F.col(id_col), F.array(*cols).alias("proj"))


def pq_fit(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    refine_iters: int = 1,
) -> list:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    vector into ``m`` subvectors and learn ``k`` centroids per subspace.
    Returns ``codebooks[m][k][d/m]`` (driver-side — m·k·d/m doubles, the
    same bounded-collect discipline as the IVF centroid pull).

    Seeds are the ``k`` corpus vectors with the smallest
    ``(h60(id), id)`` — deterministic, no RNG state, and SQL-replicable
    (the md5 arithmetic every oracle shares) — sliced per subspace, so
    ``refine_iters=0`` gives a fully cross-engine-derivable quantizer.
    Each Lloyd step is ONE pq_encode pass (narrow Arrow batches, zero
    shuffle) plus ONE (sub, code, pos) mean groupBy whose output is
    m·k·(d/m)-bounded — nothing corpus-sized ever reaches the driver.
    Empty cells keep their previous centroid (classic PQ behavior)."""
    import numpy as np

    from orientdb_spark.pipeline.common import h60

    if m < 1 or k < 1 or refine_iters < 0:
        raise ValueError(f"need m >= 1, k >= 1, refine_iters >= 0, got {m}, {k}, {refine_iters}")
    corpus = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    probe = corpus.select(F.size("__v").alias("d")).first()
    if probe is None:
        raise ValueError("cannot fit PQ on an empty corpus")
    d = probe["d"]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    seed_rows = (
        corpus.withColumn("__h", h60(F.col("__id").cast("string")))
        .orderBy("__h", "__id")
        .limit(k)
        .select("__v")
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"corpus smaller than k={k}")
    seeds = np.asarray([r["__v"] for r in seed_rows], dtype=np.float64)
    books = [seeds[:, s * dsub:(s + 1) * dsub].copy() for s in range(m)]
    for _ in range(refine_iters):
        enc = pq_encode(corpus, books, vec_col="__v", id_col="__id")
        sub = (F.col("pos") / dsub).cast("int")
        rows = (
            enc.join(corpus, "__id")
            .select("codes", F.posexplode("__v").alias("pos", "x"))
            .select(
                sub.alias("s"),
                F.element_at("codes", (sub + F.lit(1)).cast("int")).alias("c"),
                (F.col("pos") % dsub).alias("p"),
                "x",
            )
            .groupBy("s", "c", "p")
            .agg(F.avg("x").alias("mavg"))
            .collect()  # m*k*dsub-bounded
        )
        for r in rows:
            books[r["s"]][r["c"]][r["p"]] = r["mavg"]
    return [b.tolist() for b in books]


def pq_encode(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector to its per-subspace nearest-centroid codes.
    Returns ``(id, codes array<int>)`` — d doubles collapse to m small
    ints, the 8-32x storage cut that makes a 100 TB embedding corpus
    scannable. One narrow Arrow stage (per batch: m small matmul-shaped
    distance folds), zero shuffles.

    FP discipline for the SQL oracle: per-subspace squared L2 distances
    accumulate DIMENSION-MAJOR in ascending order (the same sequential
    fold the DuckDB oracle's list arithmetic runs), are rounded to 6 dp
    (the cosine-oracle convention absorbing last-ulp divergence), and
    ties resolve to the LOWER code in both engines."""
    return df.select(
        F.col(id_col),
        pq_encode_udf(codebooks)(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def pq_encode_udf(codebooks: list):
    """The Arrow encode kernel behind pq_encode, exposed so callers that
    already hold a projected frame can attach codes with a narrow
    ``withColumn`` instead of a join back onto pq_encode's (id, codes)
    output (dedup's IMI product-cell blocking does this). Same FP
    discipline as pq_encode's docstring."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]

    @pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if X.size == 0:
            return pd.Series([], dtype=object)
        out = np.zeros((X.shape[0], m), dtype=np.int32)
        for s in range(m):
            Xs = X[:, s * dsub:(s + 1) * dsub]
            C = books[s]
            acc = np.zeros((X.shape[0], C.shape[0]))
            for dd in range(dsub):  # dimension-major: SQL-fold-identical
                diff = Xs[:, dd][:, None] - C[:, dd][None, :]
                acc += diff * diff
            out[:, s] = np.argmin(np.round(acc, 6), axis=1)  # ties → lower code
        return pd.Series([row.tolist() for row in out])

    return enc


def pq_query_lut_udf(codebooks: list, metric: str = "dot"):
    """Arrow-batched LUT builder for ADC: per input vector, the
    m × n_codes table of subspace scores against the codebooks. Tiny
    per-row output (m·n_codes doubles); shared by pq_topk and
    similarity.ivfpq_topk.

    ``metric="dot"``: lut[s][c] = q_s · codeword (score = approximate
    dot product, rank DESCENDING). ``metric="l2"``: lut[s][c] =
    ||q_s − codeword||² (score = approximate squared L2, rank
    ASCENDING — Jégou et al. TPAMI'11 eq. 12's ADC term). In the
    residual IVFADC composition the l2 LUT is built per (query, cell)
    over q − c_cell, where Σ_s lut[s][code_s] = ||(q−c) − r̂||² ≈
    ||q − x||² exactly as the paper formulates it.

    FP discipline for the SQL oracle: per-codeword scores accumulate
    DIMENSION-MAJOR in ascending order (the pq_encode convention — the
    same sequential fold the DuckDB oracle's list arithmetic runs), not
    via BLAS matvec, whose pairwise summation can diverge from the
    sequential fold at the last ulp."""
    from pyspark.sql.functions import pandas_udf

    if metric not in ("dot", "l2"):
        raise ValueError(f"metric must be 'dot' or 'l2', got {metric!r}")
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    dsub = books[0].shape[1]

    @pandas_udf("array<array<double>>")
    def lut(vs: pd.Series) -> pd.Series:
        out = []
        for v in vs:
            x = np.asarray(v, dtype=np.float64)
            tabs = []
            for s in range(m):
                xs = x[s * dsub:(s + 1) * dsub]
                C = books[s]
                acc = np.zeros(C.shape[0])
                for dd in range(dsub):  # dimension-major: SQL-fold-identical
                    if metric == "dot":
                        acc += C[:, dd] * xs[dd]
                    else:
                        diff = C[:, dd] - xs[dd]
                        acc += diff * diff
                tabs.append(acc.tolist())
            out.append(tabs)
        return pd.Series(out)

    return lut


def pq_adc_score(codes_col, lut_col):
    """ADC score as a pure Column: sum over subspaces of
    lut[sub][code] — JVM-side zip_with/element_at fold, no Python in
    the corpus scan."""
    return F.aggregate(
        F.zip_with(
            codes_col, lut_col,
            lambda c, t: F.element_at(t, (c + F.lit(1)).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: list | None = None,
    refine_iters: int = 1,
    codes: DataFrame | None = None,
    metric: str = "dot",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    PQ codes: each query precomputes an m×n_codes lookup table of
    subspace scores against the codebooks; a corpus CODE scan then
    scores every item as the sum of m table lookups — never touching the
    original vectors. Same output shape as brute_force_topk
    (query_id, neighbor_id, score, rank), score = approximate dot
    product (== approximate cosine on unit-normalized corpora, which the
    test corpus is). ``metric="l2"`` scores approximate SQUARED L2
    instead (nearest = smallest — ranks ascend). On a unit-norm corpus
    whose PQ reconstruction is EXACT (every subspace slice is a
    codeword) the l2 and dot orderings coincide, since then
    ||q−x̂||² = ||q||² + ||x||² − 2·q·x̂ with exact x̂ = x;
    tests/test_quantize.py pins this on a codes-cover-corpus fixture.
    With INEXACT reconstruction the l2 score carries a per-code
    ||x̂_c||² term the dot score lacks, so the two orderings may
    legitimately diverge. Approximate by construction → recall/
    planted-pair gates live in tests/test_quantize.py.

    Scale shape: the LUT column is m·n_codes doubles per QUERY (tiny,
    broadcast); the corpus side scans codes only (m ints/row instead of
    d doubles — the point of PQ), scoring is a pure Column
    zip_with/element_at fold (JVM-side, no Python in the corpus scan),
    and ranking is the shared per-query window
    (common.per_query_topk_rank — Catalyst's WindowGroupLimit prunes to
    k rows per query map-side, so no task ever sorts a whole corpus).

    Build-once/query-many: pass ``codebooks`` (pq_fit) AND ``codes``
    (pq_encode output, persisted/written once) and no corpus-vector
    work runs at query time at all — the query-time cost is the code
    scan alone, which is what a 100 TB serving path wants."""
    from orientdb_spark.pipeline.common import per_query_topk_rank

    if codebooks is None:
        codebooks = pq_fit(df, m, n_codes, vec_col, id_col, refine_iters)
    if codes is None:
        codes = pq_encode(df, codebooks, vec_col, id_col)
    corpus_codes = codes.withColumnRenamed(id_col, "neighbor_id")
    lut = pq_query_lut_udf(codebooks, metric)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        lut(F.col(vec_col).cast("array<double>")).alias("__lut"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(corpus_codes)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # +1e-12 before round: Spark HALF_UP on the exact double vs
        # DuckDB's shortest-decimal round diverge within one ulp of a
        # .5e-6 midpoint — the quality_score nudge, applied on BOTH
        # engines (the oracle adds the same epsilon)
        .withColumn(
            "score",
            F.round(pq_adc_score(F.col("codes"), F.col("__lut")) + F.lit(1e-12), 6),
        )
    )
    order = F.col("score").asc() if metric == "l2" else F.col("score").desc()
    return per_query_topk_rank(
        scored, k, [order, F.col("neighbor_id")]
    ).select("query_id", "neighbor_id", "score", "rank")


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 8,
) -> dict:
    """Fit PCA over an embedding column, distributed the way a 100 TB
    corpus demands: each partition folds its rows into ONE partial
    (n, sum_x, sum_xxT) via an Arrow-batched ``mapInPandas`` (numpy
    matmul per batch — no per-row Python), the partition partials (a
    partition-count-bounded collect, same discipline as the IVF
    centroid pull) reduce on the driver, and the d x d eigenproblem —
    micro-work for embedding dims — runs in numpy. Sign convention:
    each component is flipped so its largest-|w| coordinate is
    positive, making the result deterministic across LAPACK builds.

    Returns ``{"mean": [d], "components": [k][d] (rows = top-k
    eigenvectors), "explained_variance_ratio": [k], "n": int}``.
    """
    import numpy as np

    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")

    def partials(batches):
        import pandas as pd

        n = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(
        partials, "n long, s array<double>, ss array<double>"
    ).collect()
    if not rows:
        raise ValueError("cannot fit PCA on an empty corpus")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    if n_components > d:
        raise ValueError(f"n_components {n_components} > dim {d}")
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    # deterministic sign: largest-|w| coordinate positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    ev = np.clip(evals[order], 0.0, None)
    total = float(np.clip(evals, 0.0, None).sum()) or 1.0
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance_ratio": (ev / total).tolist(),
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project vectors onto a fitted PCA basis:
    ``y_j = (x - mean) . component_j`` as a pure narrow transform —
    the mean and each component ride in as broadcast literal arrays,
    zero shuffles (the sign_random_projection shape). Returns
    ``(id, proj array<double>)``."""
    from orientdb_spark.pipeline.common import dot_product

    mean = model["mean"]
    comps = model["components"]
    vec = F.col(vec_col).cast("array<double>")
    centered = F.zip_with(vec, F.lit(mean), lambda x, m: x - m)
    cols = [dot_product(centered, F.lit(list(c))) for c in comps]
    return df.select(F.col(id_col), F.array(*cols).alias("proj"))
