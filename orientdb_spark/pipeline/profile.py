"""One-pass column profiling (data-quality audit).

Per column: row count, non-null count, distinct count, numeric min/max,
string min/max — the summary every ingest step runs before trusting a
new drop of training data.

Shape at scale: ONE aggregation job over ONE scan regardless of column
count (the per-column aggregates are siblings in a single agg, then the
1-row result is reshaped to a row per column with ``stack`` — reshaping
1xN_cols is free). Exact ``countDistinct`` makes Spark Expand the input
once per counted column, which is the right trade for a correctness
audit at test scale; pass ``approx=True`` to switch to
``approx_count_distinct`` (HLL sketch, no Expand, one pass) for the
100 TB profile run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, NumericType, StringType

__all__ = [
    "profile_columns",
    "fk_orphans",
    "quantile_bins",
    "column_entropy",
    "winsorize_stats",
    "dataset_card",
    "dp_noisy_counts",
]


def fk_orphans(
    relations: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each
    ``(name, child, child_key, parent, parent_key)`` relation, count the
    child rows whose key has no parent (null keys excluded — a null FK
    is absent, not dangling). Returns (relation, n_child, n_orphans).

    Each relation costs one left anti-join (broadcast when the parent's
    key projection is small; SMJ/AQE otherwise) plus a count-only agg —
    the union glues together single-row aggregates, so the result is
    relation-count-sized no matter how large the tables are."""
    if not relations:
        raise ValueError("no relations to audit")
    outs = []
    for name, child, ckey, parent, pkey in relations:
        keys = child.select(F.col(ckey).alias("__k")).filter(F.col("__k").isNotNull())
        orphans = keys.join(
            parent.select(F.col(pkey).alias("__k")).dropDuplicates(),
            "__k",
            "left_anti",
        )
        outs.append(
            keys.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            ).select(F.lit(name).alias("relation"), "n_child", "n_orphans")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = False,
    rsd: float = 0.01,
) -> DataFrame:
    """Profile ``cols`` (default: every numeric/string/boolean column).

    Returns one row per column:
    ``(column, n_rows, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str)`` — the num/str min-max pair that doesn't apply to
    the column's type is null, keeping one uniform output schema.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    if cols is None:
        cols = [
            c
            for c, t in schema.items()
            if isinstance(t, (NumericType, StringType, BooleanType))
        ]
    cols = list(cols)
    if not cols:
        raise ValueError("no columns to profile")
    for c in cols:
        t = schema.get(c)
        if t is None:
            raise ValueError(f"unknown column: {c}")
        if not isinstance(t, (NumericType, StringType, BooleanType)):
            raise ValueError(f"unsupported type for profiling {c}: {t.simpleString()}")

    nd = (
        (lambda c: F.approx_count_distinct(c, rsd))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = []
    for c in cols:
        numeric = isinstance(schema[c], (NumericType, BooleanType))
        num = F.col(c).cast("double") if numeric else F.lit(None).cast("double")
        s = F.col(c) if isinstance(schema[c], StringType) else F.lit(None).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"__{c}__n"),
            F.count(F.col(c)).alias(f"__{c}__nn"),
            nd(c).alias(f"__{c}__nd"),
            F.round(F.min(num), 4).alias(f"__{c}__minn"),
            F.round(F.max(num), 4).alias(f"__{c}__maxn"),
            F.min(s).alias(f"__{c}__mins"),
            F.max(s).alias(f"__{c}__maxs"),
        ]
    one = df.agg(*aggs)
    parts = []
    for c in cols:
        parts += [
            F.lit(c),
            F.col(f"__{c}__n"),
            F.col(f"__{c}__nn"),
            F.col(f"__{c}__nd"),
            F.col(f"__{c}__minn"),
            F.col(f"__{c}__maxn"),
            F.col(f"__{c}__mins"),
            F.col(f"__{c}__maxs"),
        ]
    return one.select(
        F.stack(F.lit(len(cols)), *parts).alias(
            "column",
            "n_rows",
            "n_nonnull",
            "n_distinct",
            "min_num",
            "max_num",
            "min_str",
            "max_str",
        )
    )


def histogram(df: DataFrame, col: str, bins: int = 20) -> DataFrame:
    """Equi-width histogram of a numeric column: global [min, max] split
    into ``bins`` buckets, the max value folded into the last bucket.
    Returns (bin, bin_lo, bin_hi, n) — empty buckets are absent.

    Two passes over the column, both single-aggregate: the (min, max)
    pair rides back in as a broadcast one-row cross join (the same
    pattern as tfidf's corpus size), then bin assignment is a narrow
    projection into one bins-bounded groupBy. A degenerate column
    (min == max) lands everything in bin 0 instead of dividing by zero.
    """
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    c = F.col(col).cast("double")
    stats = df.agg(F.min(c).alias("__lo"), F.max(c).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / bins
    idx = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(F.floor((c - F.col("__lo")) / width), F.lit(bins - 1))
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .select(idx.cast("int").alias("bin"), "__lo", "__hi")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("__lo").alias("__lo"),
            F.first("__hi").alias("__hi"),
        )
        .select(
            "bin",
            F.round(F.col("__lo") + F.col("bin") * (F.col("__hi") - F.col("__lo")) / bins, 6).alias("bin_lo"),
            F.round(F.col("__lo") + (F.col("bin") + 1) * (F.col("__hi") - F.col("__lo")) / bins, 6).alias("bin_hi"),
            "n",
        )
    )


def json_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema discovery over a semi-structured JSON string column: one
    row per key with presence count, distinct-value count, and how many
    values parse as numbers. Returns (key, n_present, n_distinct_values,
    n_numeric).

    The document is parsed ONCE per row into map<string,string>
    (from_json — dynamic keys, unlike get_json_object's foldable-path
    limit) and exploded; everything downstream is one groupBy on the
    key. Key cardinality, not row count, bounds the output — the shape
    you want when profiling a 100 TB event stream with a dozen-key
    schema. Exact distincts here; swap count_distinct for
    approx_count_distinct when the value domain is unbounded.
    """
    kv = df.select(
        F.explode(F.from_json(F.col(json_col), "map<string,string>")).alias(
            "key", "value"
        )
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.count_distinct(F.col("value")).alias("n_distinct_values"),
        F.count(F.col("value").cast("double")).alias("n_numeric"),
    )


def iqr_outlier_fences(
    df: DataFrame, col: str, group_cols: "Sequence[str]" = ()
) -> DataFrame:
    """Tukey outlier audit per group: exact q1/q3 (linear interpolation,
    the quantile_cont semantics DuckDB shares), fences at 1.5 IQR, and
    how many rows fall outside. One two-pass shape: a percentile agg per
    group, broadcast back onto the rows, one count agg — both groupBys
    on the same key. Returns (*group_cols, q1, q3, lo_fence, hi_fence,
    n_rows, n_outliers)."""
    gcols = list(group_cols)
    c = F.col(col).cast("double")
    fences = df.groupBy(*gcols).agg(
        F.percentile(c, F.lit(0.25)).alias("q1"),
        F.percentile(c, F.lit(0.75)).alias("q3"),
    )
    fences = fences.select(
        *gcols,
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    joined = (
        df.join(F.broadcast(fences), gcols)
        if gcols
        else df.crossJoin(F.broadcast(fences))
    )
    out_flag = (c < F.col("lo_fence")) | (c > F.col("hi_fence"))
    return joined.groupBy(
        *gcols, "q1", "q3", "lo_fence", "hi_fence"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(out_flag.cast("long")).alias("n_outliers"),
    )


def k_anonymity(
    df: DataFrame, quasi_cols: "Sequence[str]", k: int = 5
) -> DataFrame:
    """Privacy audit: equivalence classes over the quasi-identifier
    columns with their sizes, flagging classes smaller than ``k`` (the
    re-identification risk a release must not ship). Returns
    (*quasi_cols, class_size, violates_k) — one groupBy, map-side
    combinable; at 100 TB add a salted pre-agg only if a single
    quasi-class dominates (same trade as any keyed count)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    qc = list(quasi_cols)
    if not qc:
        raise ValueError("k_anonymity needs at least one quasi-identifier column")
    return df.groupBy(*qc).agg(
        F.count(F.lit(1)).alias("class_size")
    ).withColumn("violates_k", F.col("class_size") < k)


def l_diversity(
    df: DataFrame,
    quasi_cols: "Sequence[str]",
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2006 — the privacy
    property k-anonymity misses: a k-anonymous class whose members all
    share one sensitive value still discloses it): per equivalence
    class over the quasi-identifier columns, ``class_size``,
    ``l_distinct`` (distinct sensitive values, NULL counted as its own
    value — an absent diagnosis is itself sensitive), ``top_sensitive_n``
    (the modal sensitive value's count — the numerator a recursive
    (c,l)-diversity check reads), and ``violates_l`` (l_distinct < l).

    Scale shape: two stacked map-side-combinable aggregations — groupBy
    (quasi + sensitive) to value-level counts, then groupBy(quasi) for
    size/distinct/max — never a count_distinct shuffle of raw rows and
    never a per-class collect. At 100 TB the first groupBy bounds the
    second's input by the number of DISTINCT (class, value) pairs; skew
    on a hot class is a keyed-count salting trade, same as k_anonymity."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    qc = list(quasi_cols)
    if not qc:
        raise ValueError("l_diversity needs at least one quasi-identifier column")
    value_counts = df.groupBy(
        *qc, F.col(sensitive_col).alias("__sv")
    ).agg(F.count(F.lit(1)).alias("__n"))
    return (
        value_counts.groupBy(*qc)
        .agg(
            F.sum("__n").cast("long").alias("class_size"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
            F.max("__n").cast("long").alias("top_sensitive_n"),
        )
        .withColumn("violates_l", F.col("l_distinct") < l)
    )


def stat_drift(
    old: DataFrame, new: DataFrame, cols: "Sequence[str]"
) -> DataFrame:
    """Snapshot drift audit between two versions of a table: per column,
    row counts, null fractions, and (numeric) means side by side with
    deltas — the monitoring pass that catches a silently-shifted
    upstream. One aggregate pass per side (every column's stats ride a
    single agg), stack-reshaped to rows; never a per-column scan.
    Returns (column, old_n, new_n, old_null_frac, new_null_frac,
    old_mean, new_mean, mean_shift)."""
    cols = list(cols)
    if not cols:
        raise ValueError("stat_drift needs at least one column")

    def side(df: DataFrame, tag: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs.append(
                (F.sum(F.col(c).isNull().cast("long")) / F.count(F.lit(1))).alias(
                    f"__nf_{c}"
                )
            )
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"__m_{c}"))
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{c}', __nf_{c}, __m_{c}" for c in cols)
        return wide.selectExpr(
            f"stack({len(cols)}, {stack}) as (column, {tag}_null_frac, {tag}_mean)",
            f"__n as {tag}_n",
        )

    o = side(old, "old")
    nw = side(new, "new")
    return o.join(nw, "column").select(
        "column",
        "old_n",
        "new_n",
        F.round("old_null_frac", 6).alias("old_null_frac"),
        F.round("new_null_frac", 6).alias("new_null_frac"),
        F.round("old_mean", 6).alias("old_mean"),
        F.round("new_mean", 6).alias("new_mean"),
        F.round(F.col("new_mean") - F.col("old_mean"), 6).alias("mean_shift"),
    )


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Histogram drift audit between a reference and a current slice of
    a numeric feed — the per-bin table behind PSI / chi-square drift
    monitors. ``stat_drift`` catches a shifted mean; this catches a
    reshaped distribution whose mean barely moved (a bimodal split, a
    clamp at a new bound, a silently-changed unit on a subpopulation).

    Bins are equal-width over [lo, hi) — explicit bounds, or derived
    from the REFERENCE side's min/max (one 1-row broadcast aggregate,
    the score_calibration ``binning="range"`` shape; the plan stays
    lazy). Out-of-range current values clamp into the edge bins so a
    drifted tail is visible rather than dropped; NULLs are excluded
    from both sides.

    Per non-empty bin: ``ref_n``/``cur_n``, ``ref_frac``/``cur_frac``
    (6-dp grid), ``abs_diff`` (the total-variation contribution —
    TV distance = sum/2), and ``chi2_contrib`` ((cur_n − e)²/e with
    e = ref_frac·cur_total; NULL where the bin has no reference mass —
    chi-square is undefined there and a blind 0 would hide exactly the
    novel-mode drift the audit exists to catch). No PSI scalar is
    emitted: PSI's (p−q)·ln(p/q) rides libm and a partition-order
    float sum — consumers sum the exact per-bin rows instead (the
    benford_audit discipline).

    Shape at scale: ONE map-side-combinable groupBy reduces both scans
    to ≤ n_bins rows; totals are windows over that bin-bounded frame.
    """
    from pyspark.sql import Window

    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    if (lo is None) != (hi is None):
        raise ValueError("pass both lo and hi, or neither")
    x = F.col(col).cast("double")
    u = ref.select(F.lit(0).alias("__side"), x.alias("__x")).unionAll(
        cur.select(F.lit(1).alias("__side"), x.alias("__x"))
    ).filter(F.col("__x").isNotNull())
    if lo is None:
        span = ref.agg(
            F.min(x).cast("double").alias("__lo"),
            F.max(x).cast("double").alias("__hi"),
        )
        u = u.crossJoin(F.broadcast(span))
    else:
        u = u.withColumn("__lo", F.lit(float(lo))).withColumn(
            "__hi", F.lit(float(hi))
        )
    b = F.when(
        F.col("__hi") > F.col("__lo"),
        F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.floor(
                    (F.col("__x") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * F.lit(n_bins)
                ).cast("long"),
                F.lit(n_bins - 1).cast("long"),
            ),
        ),
    ).otherwise(F.lit(0).cast("long"))
    g = (
        u.select(b.alias("bin"), F.col("__side"), F.col("__lo"), F.col("__hi"))
        .groupBy("bin", "__lo", "__hi")
        .agg(
            F.sum(F.lit(1) - F.col("__side")).cast("long").alias("ref_n"),
            F.sum("__side").cast("long").alias("cur_n"),
        )
    )
    everything = Window.partitionBy()
    rt = F.greatest(F.sum("ref_n").over(everything).cast("double"), F.lit(1.0))
    ct = F.greatest(F.sum("cur_n").over(everything).cast("double"), F.lit(1.0))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(n_bins)
    ref_frac = F.round(F.col("ref_n") / rt + F.lit(1e-12), 6)
    cur_frac = F.round(F.col("cur_n") / ct + F.lit(1e-12), 6)
    e = ref_frac * ct
    dev = F.col("cur_n") - e
    return g.select(
        F.col("bin").cast("int").alias("bin"),
        F.round(F.col("__lo") + F.col("bin") * width + F.lit(1e-12), 6).alias(
            "lo_edge"
        ),
        F.round(
            F.col("__lo") + (F.col("bin") + 1) * width + F.lit(1e-12), 6
        ).alias("hi_edge"),
        "ref_n",
        "cur_n",
        ref_frac.alias("ref_frac"),
        cur_frac.alias("cur_frac"),
        F.round(F.abs(ref_frac - cur_frac) + F.lit(1e-12), 6).alias("abs_diff"),
        F.when(
            F.col("ref_n") > 0,
            F.round(dev * dev / e + F.lit(1e-12), 6),
        ).alias("chi2_contrib"),
    )


def quantile_bins(
    df: DataFrame, col: str, group_cols: "Sequence[str]" = (), q: int = 4
) -> DataFrame:
    """Equal-frequency discretization per group: cut a numeric column at
    its exact interpolated ``i/q`` quantiles (quantile_cont semantics)
    and report each bin's population and value range — the feature-
    binning step of a training pipeline, and the per-group histogram
    whose bucket edges adapt to the distribution (contrast
    ``histogram``'s fixed equal-width grid).

    Bin membership: ``bin = 1 + #{cutpoints < x}`` — values equal to a
    cutpoint close the lower bin, matching SQL's ``x <= c`` convention.
    Same two-pass shape as iqr_outlier_fences: one percentile agg per
    group (a q-1-element result), broadcast back onto the rows, one
    count agg — the rows are scanned twice and shuffled once per
    groupBy, nothing grows with q.

    Returns ``(*group_cols, bin, n_rows, lo, hi)`` with bins 1..q
    (empty bins absent — a heavily tied distribution can starve one).
    NULL values are excluded from binning entirely — they are invisible
    to the cutpoints (percentile skips them) and would otherwise land
    in bin 1 because ``NULL > cut`` is falsy, silently inflating its
    count while lo/hi ignored them.
    """
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    gcols = list(group_cols)
    df = df.filter(F.col(col).isNotNull())
    c = F.col(col).cast("double")
    cuts = df.groupBy(*gcols).agg(
        *[
            F.percentile(c, F.lit(i / q)).alias(f"__c{i}")
            for i in range(1, q)
        ]
    )
    joined = (
        df.join(F.broadcast(cuts), gcols)
        if gcols
        else df.crossJoin(F.broadcast(cuts))
    )
    bin_col = F.lit(1)
    for i in range(1, q):
        bin_col = bin_col + F.when(c > F.col(f"__c{i}"), 1).otherwise(0)
    return (
        joined.withColumn("bin", bin_col)
        .groupBy(*gcols, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(c).alias("lo"),
            F.max(c).alias("hi"),
        )
    )


def column_entropy(
    df: DataFrame, col: str, group_cols: "Sequence[str]" = ()
) -> DataFrame:
    """Shannon entropy (nats) of a categorical column per group — the
    corpus-composition diversity metric (is one source all-English? is
    a label column collapsing?). Uses the identity
    ``H = ln(n) - (sum c_v ln c_v) / n`` over the value counts, so the
    whole thing is two partial-agg groupBys (value counts, then one
    per-group fold) — no window, no second scan of the rows. NULL
    counts as its own category. Returns
    ``(*group_cols, n_rows, n_distinct, entropy)``."""
    gcols = list(group_cols)
    counts = df.groupBy(*gcols, F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    n = F.sum("__c")
    return counts.groupBy(*gcols).agg(
        n.alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        (
            F.log(n) - F.sum(F.col("__c") * F.log("__c")) / n
        ).alias("entropy"),
    )


def winsorize_stats(
    df: DataFrame,
    col: str,
    group_cols: "Sequence[str]" = (),
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorized summary per group: clip the column at its exact
    interpolated ``lo``/``hi`` quantiles (quantile_cont semantics) and
    report how many rows each fence clipped plus the mean before and
    after — the outlier-robust preprocessing step, same two-pass
    broadcast-fences shape as iqr_outlier_fences.

    Returns ``(*group_cols, p_lo, p_hi, n_rows, n_clipped_lo,
    n_clipped_hi, mean_raw, mean_winsorized)``.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got {lo}, {hi}")
    gcols = list(group_cols)
    c = F.col(col).cast("double")
    fences = df.groupBy(*gcols).agg(
        F.percentile(c, F.lit(lo)).alias("p_lo"),
        F.percentile(c, F.lit(hi)).alias("p_hi"),
    )
    joined = (
        df.join(F.broadcast(fences), gcols)
        if gcols
        else df.crossJoin(F.broadcast(fences))
    )
    clipped = F.greatest(F.least(c, F.col("p_hi")), F.col("p_lo"))
    return joined.groupBy(*gcols, "p_lo", "p_hi").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((c < F.col("p_lo")).cast("long")).alias("n_clipped_lo"),
        F.sum((c > F.col("p_hi")).cast("long")).alias("n_clipped_hi"),
        F.avg(c).alias("mean_raw"),
        F.avg(clipped).alias("mean_winsorized"),
    )


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    approx: bool = False,
    approx_accuracy: int = 10000,
    rsd: float = 0.01,
) -> DataFrame:
    """Dataset-card statistics (the disclosure table a corpus release
    publishes — the Datasheets/data-card practice): corpus totals,
    per-language document shares, per-source document counts, length
    percentiles, and the exact-duplicate rate. Long format
    (section, key, value) so new statistics never change the schema.

    Shape at scale: ONE narrow corpus pass computes the per-doc
    statistics row (token count, length, content digest, lang, source),
    cached once because five aggregate branches read it; every branch
    is then a tiny groupBy/agg whose output is bounded by the number of
    languages/sources, not N. No branch re-scans the corpus. The exact
    length percentiles and exact countDistinct are the parity choices
    and the ``approx=False`` default; ``approx=True`` is the 100 TB
    path — percentile_approx (mergeable sketch, no single-reducer value
    buffering; ``approx_accuracy`` trades size for error) and
    approx_count_distinct (HLL++, relative error ``rsd``). A release
    card tolerates sketch error; only the oracle forces exact."""
    card = _dataset_card_plan(
        df, text_col, lang_col, source_col, approx, approx_accuracy, rsd
    )
    # Eagerly materialize the card (bounded: 7 + |langs| + |sources|
    # rows) and cut its lineage so the corpus-sized per-doc cache can be
    # freed HERE rather than left pinned until LRU eviction / session
    # end. The card is a report — eager is its natural contract; the
    # only blocks that remain checkpointed are card-sized, not N-sized.
    # try/finally: if the checkpoint raises (a failed branch aggregate)
    # the corpus-sized per-doc persist must still be freed — without it
    # the cache leaked until session end (r12 advice)
    try:
        out = card.localCheckpoint()
    finally:
        card._ods_per_doc.unpersist()
    return out


def _dataset_card_plan(
    df: DataFrame,
    text_col: str,
    lang_col: str,
    source_col: str,
    approx: bool,
    approx_accuracy: int,
    rsd: float,
) -> DataFrame:
    """Lazy card plan (plan-pin surface for tests); ``dataset_card``
    wraps it with the eager materialize-then-free cache discipline. The
    per-doc cached frame rides back on the ``_ods_per_doc`` attribute
    so the wrapper can unpersist it."""
    from orientdb_spark.pipeline.common import ws_tokens

    # persist(), NOT localCheckpoint: the cache is LRU-evictable (Spark
    # recomputes from lineage if memory pressure hits) and is explicitly
    # unpersisted by dataset_card once the card has been materialized —
    # a checkpoint here would pin corpus-sized blocks that
    # DataFrame.unpersist() cannot release
    per_doc = df.select(
        F.col(lang_col).alias("__lang"),
        F.col(source_col).alias("__src"),
        F.length(F.col(text_col)).cast("double").alias("__chars"),
        F.size(ws_tokens(F.col(text_col))).cast("double").alias("__toks"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("__digest"),
    ).persist()
    if approx:
        nd = lambda c: F.approx_count_distinct(c, rsd)  # noqa: E731
        pctl = lambda c, q: F.percentile_approx(  # noqa: E731
            c, F.lit(q), F.lit(int(approx_accuracy))
        )
    else:
        nd = lambda c: F.countDistinct(c)  # noqa: E731
        pctl = lambda c, q: F.percentile(c, F.lit(q))  # noqa: E731
    corpus = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("__toks").alias("total_ws_tokens"),
        nd("__lang").cast("double").alias("distinct_langs"),
        nd("__src").cast("double").alias("distinct_sources"),
        nd("__digest").cast("double").alias("__uniq"),
        F.round(pctl(F.col("__chars"), 0.5) + F.lit(1e-12), 6).alias(
            "p50_chars"
        ),
        F.round(pctl(F.col("__chars"), 0.9) + F.lit(1e-12), 6).alias(
            "p90_chars"
        ),
    ).select(
        F.expr(
            "stack(7, 'corpus', 'n_docs', n_docs, "
            "'corpus', 'total_ws_tokens', total_ws_tokens, "
            "'corpus', 'distinct_langs', distinct_langs, "
            "'corpus', 'distinct_sources', distinct_sources, "
            "'corpus', 'exact_dup_rate', "
            "round((n_docs - __uniq) / n_docs + 1e-12, 6), "
            "'length', 'p50_chars', p50_chars, "
            "'length', 'p90_chars', p90_chars) AS (section, key, value)"
        )
    )
    n = per_doc.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    langs = (
        per_doc.groupBy("__lang")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
        .crossJoin(F.broadcast(n))
        .select(
            F.lit("lang_share").alias("section"),
            F.col("__lang").alias("key"),
            F.round(F.col("__c") / F.col("__n") + F.lit(1e-12), 6).alias("value"),
        )
    )
    sources = (
        per_doc.groupBy("__src")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
        .select(
            F.lit("source_docs").alias("section"),
            F.col("__src").alias("key"),
            F.col("__c").alias("value"),
        )
    )
    card = corpus.unionByName(langs).unionByName(sources)
    card._ods_per_doc = per_doc
    return card


def dp_noisy_counts(
    df: DataFrame,
    group_col: str = "lang",
    epsilon: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Differential-privacy-style noisy group counts (the Laplace
    mechanism, Dwork et al. 2006): per-group document counts released
    with Laplace(1/epsilon) noise — the marginal-release shape a corpus
    card uses when exact counts would leak membership. Noise is
    DETERMINISTIC given (seed, group): u = (h60("dp:<seed>:<group>") +
    0.5) / 2^60 ∈ (0,1), lap = -(1/eps)·sign(u-½)·ln(1-2|u-½|) — the
    inverse-CDF transform on a seeded uniform, so re-runs and the
    DuckDB replay agree bit-for-bit (the only libm call is ln, the
    lm_score parity precedent). A REAL release would drop n_true and
    rotate the seed per release; both stay here so the mechanism is
    verifiable.

    Shape at scale: one map-side-combinable groupBy; the noise is
    per-GROUP arithmetic on the aggregate row — bounded by group
    cardinality, not N."""
    from orientdb_spark.pipeline.common import h60

    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    u = (
        h60(F.concat(F.lit(f"dp:{seed}:"), F.col("grp").cast("string")))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**60))
    centered = u - F.lit(0.5)
    lap = (
        F.lit(-1.0 / float(epsilon))
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        F.col("grp").alias(group_col),
        "n_true",
        F.round(F.col("n_true") + lap + F.lit(1e-12), 6).alias("noisy_count"),
    )


# Benford's-law expected first-digit frequencies log10(1 + 1/d),
# precomputed as literal doubles so neither engine calls libm at
# runtime (the rank_eval discount-table discipline)
BENFORD_EXPECTED = {
    d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_audit(
    df: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic forensic data-quality audit (Benford 1938; standard
    practice in fraud/anomaly screening): naturally-generated
    multiplicative quantities (prices, populations, file sizes) follow
    P(d) = log10(1 + 1/d), while fabricated, truncated, or
    unit-clamped columns deviate hard. A per-source deviation table is
    a cheap tripwire for synthetic or corrupted feeds in a 100 TB
    ingest.

    Returns one row per (group, digit 1-9): ``n``, ``observed_frac``,
    ``expected_frac``, ``deviation`` (|obs − expected|), all
    nudge-rounded to 6 dp. Zero and NULL values carry no significant
    digit and are excluded from the denominator. No chi-square scalar
    is emitted: a 9-term float sum would pick up partition-order ulps,
    while the per-digit rows are exact integer ratios against literal
    expectations — consumers square/sum if they want a statistic.

    The digit is extracted from the value's string rendering (first
    ``[1-9]`` match), which is representation-invariant: any faithful
    (round-trip) rendering — scientific or positional, Spark's or the
    oracle engine's — starts its mantissa with the same significant
    digit, and exponent digits can never precede it.

    Scale shape: one scan, one map-side-combinable groupBy to (groups
    x 9) rows, a groups-sized broadcast totals join. Nothing after the
    first aggregate touches corpus cardinality."""
    groups = list(group_cols or [])
    digit = F.regexp_extract(
        F.abs(F.col(value_col)).cast("string"), "[1-9]", 0
    )
    base = df.select(*groups, digit.alias("digit")).filter(F.col("digit") != "")
    counts = base.groupBy(*groups, "digit").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy(*groups).agg(F.sum("n").alias("__total"))
    joined = (
        counts.join(F.broadcast(totals), groups)
        if groups
        else counts.crossJoin(F.broadcast(totals))
    )
    exp_map = F.create_map(
        *[F.lit(x) for d, e in BENFORD_EXPECTED.items() for x in (str(d), e)]
    )
    obs = F.col("n").cast("double") / F.col("__total").cast("double")
    exp = exp_map[F.col("digit")]
    return joined.select(
        *groups,
        F.col("digit").cast("int").alias("digit"),
        F.col("n").cast("long").alias("n"),
        F.round(obs + F.lit(1e-12), 6).alias("observed_frac"),
        F.round(exp + F.lit(1e-12), 6).alias("expected_frac"),
        F.round(F.abs(obs - exp) + F.lit(1e-12), 6).alias("deviation"),
    )
