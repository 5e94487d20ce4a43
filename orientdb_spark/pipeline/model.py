"""Model-based curation operators — the classifier / perplexity-bucket
filtering family of LLM training-data pipelines.

Public lineage (the reference engine has no analog; these are
north-star extensions like pipeline/dedup.py and pipeline/sampling.py):

- Linear quality classifier over hashed bag-of-words features (the
  fasttext shape, Joulin et al. 2016): GPT-3 (Brown et al. 2020,
  Appendix A) and LLaMA filter CommonCrawl against curated corpora with
  exactly this model family; FineWeb-Edu (Penedo et al. 2024) is the
  same inference shape with model-generated labels. Here the model is
  TRAINED on the cluster (full-batch logistic GD — each iteration is
  one aggregate pass) and APPLIED with broadcast weights (zero model
  state on executors beyond d+1 literals).
- CCNet perplexity bucketing (Wenzek et al. 2020): per-language
  head / middle / tail terciles by LM score — the standard
  quality-stratification step before mixing CommonCrawl into a corpus.

Cross-engine determinism contract (the kmeans / k-center discipline,
pipeline/similarity.py): every iterative update is quantized to the
6-dp grid with the +1e-12 nudge (``_round6`` here replicates DuckDB's
``round(x + 1e-12, 6)`` bit-for-bit — verified half-away-from-zero
parity incl. signed zeros), so the last-ulp order noise of distributed
float sums can never accumulate across GD iterations and the whole
training run is SQL-replayable by the driver oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

from .common import h60, ws_tokens
from .text import feature_hashing, lm_score

# The dense-vector training path materializes one d-wide array per doc
# and a d+1-expression aggregate; past ~1k features the plan belongs to
# a sparse weights-DataFrame join instead (documented, not implemented
# here — linear quality filters run at d in the tens-to-hundreds).
_MAX_TRAIN_BUCKETS = 1024


def _round6(v: float) -> float:
    """Driver-side replica of the oracle's ``round(x + 1e-12, 6)``:
    half-away-from-zero on the nudged value. Verified bit-identical to
    DuckDB over midpoints, negatives, and signed zeros."""
    v = v + 1e-12
    return math.floor(abs(v) * 1e6 + 0.5) / 1e6 * (1.0 if v >= 0 else -1.0)


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    iters: int = 3,
    lr: float = 1.0,
) -> dict[int, float]:
    """Train a linear (logistic) quality classifier on hashed
    bag-of-words features — full-batch gradient descent, one
    distributed aggregate pass per iteration.

    Features: ``feature_hashing`` bucket counts, L1-normalized per doc
    (x_j = count_j / n_tokens), plus an implicit intercept. Docs with
    zero tokens are excluded. ``label_col`` must be 0/1 (cast to
    double); nulls are invalid.

    Update rule, quantized for cross-engine replay (module docstring):
        w ← round6(w − lr · Σ_i (σ(z_i) − y_i)·x_i / N)
    so after every iteration the weights sit exactly on the 6-dp grid
    in BOTH the Spark run and the driver oracle's unrolled-CTE replay —
    distributed-sum order noise (~1e-15 relative) is absorbed by the
    nudged round, never carried into the next iteration.

    Scale shape (100 TB): the feature frame is built once (one explode
    + one map-side-combinable groupBy, the feature_hashing plan) and
    densified to a d-array per doc behind ONE exchange on id, then
    lazily checkpointed; each GD iteration is a single full-table
    aggregate (d+2 partial-aggregable sums — no shuffle beyond the
    final reduce) and a 1-row collect. Driver state is d+1 floats.
    iters sequential jobs, like kmeans' Lloyd steps.

    Returns driver-side weights ``{-1: intercept, 0..d-1: w_j}`` —
    d+1 floats, the broadcast-literal input of ``classifier_score``.
    """
    if not 2 <= n_buckets <= _MAX_TRAIN_BUCKETS:
        raise ValueError(
            f"n_buckets must be in [2, {_MAX_TRAIN_BUCKETS}] for the dense "
            f"training path, got {n_buckets}"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be positive, got {lr}")

    feats = feature_hashing(df, text_col, id_col, n_buckets)
    labels = df.select(F.col(id_col), F.col(label_col).cast("double").alias("__y"))
    return _train_on_features(feats, labels, id_col, n_buckets, iters, lr)


def _train_on_features(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str,
    n_buckets: int,
    iters: int,
    lr: float,
) -> dict[int, float]:
    """The GD loop of ``train_quality_classifier`` over a prebuilt
    ``(id, bucket, n_tokens)`` feature frame — split out so the
    train-then-score composition can feed it from a shared tokenize
    pass (``train_and_score_quality_classifier``)."""
    sparse = feats.withColumn(
        "__x",
        F.col("n_tokens").cast("double")
        / F.sum("n_tokens").over(Window.partitionBy(id_col)),
    )
    dense = (
        sparse.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket"), F.col("__x")))
            ).alias("__m")
        )
        .join(labels, id_col)
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)),
                lambda j: F.coalesce(F.element_at(F.col("__m"), j), F.lit(0.0)),
            ).alias("__xs"),
            F.col("__y"),
        )
        # every iteration re-reads this frame; without the checkpoint each
        # of the `iters` aggregate jobs would re-explode the corpus (the
        # lm_score / triangle-count lesson)
        .localCheckpoint(eager=False)
    )

    w = [0.0] * n_buckets
    b = 0.0
    for _ in range(iters):
        w_arr = F.array(*[F.lit(wj) for wj in w])
        z = F.aggregate(
            F.zip_with(F.col("__xs"), w_arr, lambda x, c: x * c),
            F.lit(float(b)),
            lambda acc, v: acc + v,
        )
        it = dense.select(F.col("__xs"), (_sigmoid(z) - F.col("__y")).alias("__e"))
        row = it.agg(
            *[
                F.sum(F.element_at(F.col("__xs"), j + 1) * F.col("__e")).alias(f"g{j}")
                for j in range(n_buckets)
            ],
            F.sum("__e").alias("gb"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        if row["n"] == 0:
            raise ValueError("no documents with at least one token to train on")
        n = float(row["n"])
        w = [_round6(w[j] - lr * row[f"g{j}"] / n) for j in range(n_buckets)]
        b = _round6(b - lr * row["gb"] / n)
    return {-1: b, **{j: w[j] for j in range(n_buckets)}}


def classifier_score(
    df: DataFrame,
    weights: dict[int, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | None = None,
) -> DataFrame:
    """Score documents with a trained linear classifier (the broadcast-
    weights inference pass — how a 100 TB corpus actually applies the
    quality filter).

    score = round6(σ(Σ_tokens w[h60(tok) % d] / n_tokens + intercept));
    the per-token mean of bucket weights equals the trained model's
    Σ x_j·w_j exactly in real arithmetic (x is the L1-normalized bucket
    count), so inference applies the same features training fit.

    Plan: scan → in-row tokenize/hash → per-token weight lookup against
    a d-element broadcast literal array → ONE map-side-combinable
    groupBy(id). No joins, no model state on executors, one exchange
    total — plan-pinned in tests/test_model.py. With ``threshold`` the
    result keeps rows whose ROUNDED score clears it (deterministic:
    both engines compare identical 6-dp grid values). Docs with zero
    tokens produce no rows (no features — same exclusion as training).

    Returns (id, score) — plus the filter when ``threshold`` is given.
    """
    if -1 not in weights:
        raise ValueError("weights must contain the intercept under key -1")
    d = 1 + max((k for k in weights if k >= 0), default=-1)
    if d < 1:
        raise ValueError("weights must contain at least one feature bucket >= 0")
    w_arr = F.array(*[F.lit(float(weights.get(j, 0.0))) for j in range(d)])
    tok = (
        df.select(
            F.col(id_col),
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("__tok"),
        )
        .select(
            F.col(id_col),
            F.element_at(
                w_arr, F.pmod(h60(F.col("__tok")), F.lit(d)).cast("int") + F.lit(1)
            ).alias("__w"),
        )
    )
    z = tok.groupBy(id_col).agg(
        (F.sum("__w") / F.count(F.lit(1))).alias("__z")
    )
    out = z.select(
        F.col(id_col),
        F.round(
            _sigmoid(F.col("__z") + F.lit(float(weights[-1]))) + F.lit(1e-12), 6
        ).alias("score"),
    )
    if threshold is not None:
        out = out.filter(F.col("score") >= F.lit(float(threshold)))
    return out


def train_and_score_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    iters: int = 3,
    lr: float = 1.0,
    threshold: float | None = None,
) -> DataFrame:
    """``train_quality_classifier`` followed by ``classifier_score`` on
    the SAME corpus, sharing ONE tokenize+hash pass (guide §1.2/§6: the
    train-then-score composition used to scan and re-tokenize the corpus
    twice — the r13 profile's finding on text_classifier_score).

    The shared intermediate is the per-token ``(id, bucket)`` frame —
    exactly the oracle replay's materialized ``tk`` CTE: training
    aggregates it to bucket counts (byte-identical to feature_hashing —
    same rows, same scan partitioning, same partial aggregation), and
    scoring sums broadcast-literal weight lookups over it (the same
    per-token formula classifier_score applies; ``bucket`` is the
    already-computed ``pmod(h60(tok), d)``). One lazy localCheckpoint
    keeps the pass single: the per-token frame is (long, int) rows —
    input-token-count-sized, far narrower than the text it replaces.

    Returns exactly ``classifier_score(df, trained_weights)``."""
    if not 2 <= n_buckets <= _MAX_TRAIN_BUCKETS:
        raise ValueError(
            f"n_buckets must be in [2, {_MAX_TRAIN_BUCKETS}] for the dense "
            f"training path, got {n_buckets}"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0:
        raise ValueError(f"lr must be positive, got {lr}")

    tk = (
        df.select(
            F.col(id_col),
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("__tok"),
        )
        .select(
            id_col,
            F.pmod(h60(F.col("__tok")), F.lit(n_buckets))
            .cast("int")
            .alias("bucket"),
        )
        .localCheckpoint(eager=False)
    )
    feats = tk.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    labels = df.select(F.col(id_col), F.col(label_col).cast("double").alias("__y"))
    weights = _train_on_features(feats, labels, id_col, n_buckets, iters, lr)

    w_arr = F.array(*[F.lit(float(weights.get(j, 0.0))) for j in range(n_buckets)])
    z = tk.select(
        F.col(id_col),
        F.element_at(w_arr, F.col("bucket") + F.lit(1)).alias("__w"),
    ).groupBy(id_col).agg((F.sum("__w") / F.count(F.lit(1))).alias("__z"))
    out = z.select(
        F.col(id_col),
        F.round(
            _sigmoid(F.col("__z") + F.lit(float(weights[-1]))) + F.lit(1e-12), 6
        ).alias("score"),
    )
    if threshold is not None:
        out = out.filter(F.col("score") >= F.lit(float(threshold)))
    return out


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    lo: float = 1 / 3,
    hi: float = 2 / 3,
    k: float = 0.5,
    approx: bool = False,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """CCNet-style perplexity stratification (Wenzek et al. 2020):
    score every doc with the corpus-trained bigram LM (text.lm_score),
    cut each language at the ``lo``/``hi`` exact interpolated
    percentiles of the 6-dp-rounded NLL, and bucket docs as
    'head' (nll ≤ p_lo — most corpus-typical), 'middle' (≤ p_hi), or
    'tail'. Docs with < 2 tokens have no bigram score and are excluded
    (CCNet drops them too).

    Determinism: NLL is already 6-dp-rounded by lm_score; the
    thresholds (Spark F.percentile == DuckDB quantile_cont — the
    event_value_quantiles parity precedent) are nudge-rounded to the
    same grid before the ≤ comparisons, so bucket boundaries compare
    identical grid doubles in both engines.

    Scale shape: lm_score's plan (bigram-keyed joins) dominates; on top
    of it one groupBy(lang) over (lang, nll) pairs builds the threshold
    table — language cardinality is tiny, so it broadcasts back, and
    the bucket assignment is a narrow in-row CASE. No corpus-sized
    exchange beyond lm_score's own. One honest caveat: EXACT
    F.percentile (the ``approx=False`` default, the cross-engine-parity
    choice) buffers each language's NLLs on one reducer — fine to
    ~10⁸ docs/language. ``approx=True`` is the 100 TB path: the
    threshold stage becomes ``percentile_approx`` (a mergeable
    QuantileSummaries sketch — partial-aggregable, no per-language
    value buffering; ``approx_accuracy`` trades sketch size for error).
    Bucket cuts are semantically tolerant of approximation; only the
    oracle discipline forces exact as the default.

    Returns (id, lang, nll, bucket)."""
    if not 0 < lo <= hi < 1:
        raise ValueError(f"need 0 < lo <= hi < 1, got lo={lo}, hi={hi}")
    scored = lm_score(df, text_col, id_col, k).join(
        df.select(F.col(id_col), F.col(lang_col)), id_col
    )
    pctl = (
        (lambda c, q: F.percentile_approx(c, F.lit(q), F.lit(int(approx_accuracy))))
        if approx
        else (lambda c, q: F.percentile(c, F.lit(q)))
    )
    thr = scored.groupBy(lang_col).agg(
        F.round(pctl(F.col("nll"), lo) + F.lit(1e-12), 6).alias("__lo"),
        F.round(pctl(F.col("nll"), hi) + F.lit(1e-12), 6).alias("__hi"),
    )
    return scored.join(F.broadcast(thr), lang_col).select(
        F.col(id_col),
        F.col(lang_col),
        F.col("nll"),
        F.when(F.col("nll") <= F.col("__lo"), F.lit("head"))
        .when(F.col("nll") <= F.col("__hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def score_calibration(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
    binning: str = "unit",
) -> DataFrame:
    """Reliability / threshold-tuning table for a scored corpus (the
    calibration check run before choosing a classifier-filter
    threshold — the Guo et al. 2017 reliability-diagram shape, applied
    the way GPT-3/FineWeb-style pipelines pick their quality cutoffs):
    bin docs by score, and per bin report count, positives, mean score,
    empirical positive rate, plus cumulative-from-top ``precision_at``
    / ``recall_at`` — the precision/recall the filter would achieve if
    it kept everything scoring at or above that bin.

    ``binning="unit"`` (default) bins the absolute [0, 1] score —
    bin = least(floor(score·n_bins), n_bins−1) — the reliability-
    diagram reading where bin i means "the model said ~i/n_bins".
    ``binning="range"`` bins equal-width over the OBSERVED min–max
    (one extra 1-row aggregate, broadcast back) — the lift-table
    reading for scores that are discriminative but uncalibrated
    (an undertrained or unscaled filter concentrates its scores in a
    sliver of [0, 1] where unit deciles collapse to one bin). Empty
    bins are absent either way. Binning is deterministic cross-engine:
    both sides run the identical binary64 subtract/divide/multiply/
    floor on the same 6-dp-grid scores (a grid value near a bin edge
    may land "surprisingly" — e.g. 0.3·10 floors to 2 — but it lands
    identically in both engines).

    Shape at scale: ONE map-side-combinable groupBy reduces N rows to
    ≤ n_bins rows; every cumulative metric is window arithmetic over
    that bin-count-bounded frame. No second corpus pass, no join.

    Returns (bin, n, n_pos, mean_score, pos_rate, precision_at,
    recall_at), one row per non-empty bin."""
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    if binning not in ("unit", "range"):
        raise ValueError(f"binning must be 'unit' or 'range', got {binning!r}")
    s = F.col(score_col).cast("double")
    if binning == "unit":
        b = F.least(F.floor(s * F.lit(n_bins)).cast("long"), F.lit(n_bins - 1))
        work = df
    else:
        span = df.agg(
            F.min(s).alias("__mn"), F.max(s).alias("__mx")
        )
        work = df.crossJoin(F.broadcast(span))
        b = F.when(
            F.col("__mx") > F.col("__mn"),
            F.least(
                F.floor(
                    (s - F.col("__mn")) / (F.col("__mx") - F.col("__mn"))
                    * F.lit(n_bins)
                ).cast("long"),
                F.lit(n_bins - 1),
            ),
        ).otherwise(F.lit(0))
    agg = (
        work.select(
            b.alias("bin"),
            s.alias("__s"),
            F.col(label_col).cast("double").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
            F.sum("__s").alias("__ssum"),
        )
    )
    cum = (
        Window.orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    everything = Window.partitionBy()
    return agg.select(
        "bin",
        "n",
        "n_pos",
        F.round(F.col("__ssum") / F.col("n") + F.lit(1e-12), 6).alias("mean_score"),
        F.round(
            F.col("n_pos").cast("double") / F.col("n") + F.lit(1e-12), 6
        ).alias("pos_rate"),
        F.round(
            F.sum("n_pos").over(cum).cast("double") / F.sum("n").over(cum)
            + F.lit(1e-12),
            6,
        ).alias("precision_at"),
        F.round(
            F.sum("n_pos").over(cum).cast("double")
            / F.sum("n_pos").over(everything)
            + F.lit(1e-12),
            6,
        ).alias("recall_at"),
    )


def threshold_sweep(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    thresholds: "Sequence[float]" = (0.40, 0.42, 0.44, 0.46, 0.48, 0.50, 0.52),
) -> DataFrame:
    """Operating-point sweep for a scored corpus — the PR-curve table a
    pipeline reads to PICK the classifier-filter threshold that
    score_calibration's reliability diagram only characterizes: one row
    per candidate threshold with the full confusion-matrix counts and
    the derived metrics,

        (threshold, n, tp, fp, fn, tn, precision, recall, f1, accuracy)

    where predicted-positive is ``score >= threshold`` and a row is
    positive when ``label >= 0.5``. precision is NULL at thresholds
    with no predicted positives (not a fake 0 or 1 — the undefined
    operating point stays visibly undefined); recall is NULL only for
    an all-negative corpus; f1 uses the integer form 2·tp/(2·tp+fp+fn)
    so every metric is ONE division of exact integer counts, 6-dp
    nudge-rounded — bit-reproducible cross-engine because the scores
    live on the 6-dp grid and the thresholds are shared literals.

    Scale shape: the threshold list fans out in-map (one explode of a
    T-literal array — no join, no second scan), then ONE map-side-
    combinable groupBy to T rows. At 100 TB this is a single corpus
    scan with T-way partial counters; T is single-digit."""
    ts = [float(t) for t in thresholds]
    if not ts:
        raise ValueError("threshold_sweep needs at least one threshold")
    pos = F.col(label_col).cast("double") >= 0.5
    pred = F.col(score_col) >= F.col("threshold")
    fan = df.select(
        score_col,
        label_col,
        F.explode(F.array(*[F.lit(t) for t in ts])).alias("threshold"),
    )
    agg = fan.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((pred & pos).cast("long")).alias("tp"),
        F.sum((pred & ~pos).cast("long")).alias("fp"),
        F.sum((~pred & pos).cast("long")).alias("fn"),
        F.sum((~pred & ~pos).cast("long")).alias("tn"),
    )
    tp = F.col("tp").cast("double")
    return agg.select(
        "threshold",
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            F.when(F.col("tp") + F.col("fp") > 0, tp / (F.col("tp") + F.col("fp")))
            + F.lit(1e-12),
            6,
        ).alias("precision"),
        F.round(
            F.when(F.col("tp") + F.col("fn") > 0, tp / (F.col("tp") + F.col("fn")))
            + F.lit(1e-12),
            6,
        ).alias("recall"),
        F.round(
            F.when(
                F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                F.lit(2.0)
                * tp
                / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")),
            )
            + F.lit(1e-12),
            6,
        ).alias("f1"),
        F.round(
            (F.col("tp") + F.col("tn")).cast("double") / F.col("n").cast("double")
            + F.lit(1e-12),
            6,
        ).alias("accuracy"),
    )
