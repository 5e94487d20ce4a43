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

from pyspark.sql import DataFrame, functions as F

__all__ = ["scalar_quantize", "pca_fit", "pca_project"]


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
