"""Scale utilities — skew salting and bucketed co-located joins.

These are the 100 TB disciplines SURVEY §7 calls out (and BASELINE.json's
north star): AQE's skew-join split handles skewed *joins* automatically,
but skewed *aggregations* need explicit two-phase salting, and repeated
equi-joins on the same key are cheapest when both sides are bucketed once
(co-located, no per-query shuffle).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window, functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates on (key, salt) — spreading
    one hot key over ``salt_buckets`` reducers; phase 2 merges the partial
    results per key. Decomposable aggregates only (avg = sum/count at the
    call site). Same result as a direct groupBy, immune to single-reducer
    hot spots.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    part_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for _, (_, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"Non-decomposable aggregate '{fn}' cannot be salted")

    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[part_fn[fn](F.col(src)).alias(out) for out, (src, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[fn](F.col(out)).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-salted equi-join: the big side gets a random salt, the small
    side is exploded ``salt_buckets``× so every (key, salt) pair matches.
    One hot key spreads over ``salt_buckets`` tasks. (AQE's skew-join
    split usually makes this unnecessary — keep it for engines/paths
    where AQE is off or statistics miss the skew.)"""
    b = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    s = skewed_small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [key, "__salt"]).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table:
    repeated equi-joins/aggregations on ``bucket_col`` between tables
    bucketed the same way run shuffle-free (co-located), and the sort
    gives min/max pruning inside each bucket — the engine's analog of the
    reference's per-property index hint (SURVEY §2.7 CREATE INDEX row)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a dropped-from-catalog table can leave its warehouse dir behind —
    # managed-table creation refuses an existing location
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, table_name.lower()), ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def write_key_partitioned(
    df: DataFrame, path: str, key_col: str, n_partitions: int = 64
) -> None:
    """Write parquet hive-partitioned by a derived key bucket
    (``__kp = pmod(key, n)``): point/range predicates on the key then
    prune whole directories before any IO — the engine's file-level
    analog of the reference's RID-range cluster skipping
    (OStorageLocal.java:647-662; SURVEY §4 partition-pruning row)."""
    (
        df.withColumn("__kp", F.pmod(F.col(key_col), F.lit(n_partitions)).cast("int"))
        .write.mode("overwrite")
        .partitionBy("__kp")
        .parquet(path)
    )


def key_point_lookup(spark, path: str, key_col: str, value, n_partitions: int = 64) -> DataFrame:
    """Point lookup that hits exactly one partition directory: filters on
    both the derived bucket (prunes dirs) and the key (prunes row
    groups)."""
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("__kp") == int(value) % n_partitions) & (F.col(key_col) == value)
    ).drop("__kp")


def bucketed_join_plan_is_shuffle_free(spark, left_table: str, right_table: str, key: str) -> bool:
    """True when a join of two same-bucketed tables needs no shuffle
    Exchange — the verification hook for write_bucketed (used by tests).
    Broadcast is disabled for the check: on small inputs the planner
    prefers broadcast (also shuffle-free); bucketing pays off when both
    sides are too big to broadcast, which is the case being verified."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        lt, rt = spark.table(left_table), spark.table(right_table)
        plan = lt.join(rt, key)._jdf.queryExecution().executedPlan().toString()
        return "Exchange hashpartitioning" not in plan and "ShuffleExchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def mergeable_distinct(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    lgk: int = 12,
    total_label: str = "__total__",
) -> DataFrame:
    """Distinct-count via mergeable HLL sketches (Apache DataSketches,
    built into Spark): each group builds its own sketch, and a TOTAL row
    comes from UNIONING the per-group sketches — never rescanning the
    data. This is the 100 TB distinct pattern: shards/partitions sketch
    independently, any rollup level merges sketch bytes (kilobytes per
    group), and estimates stay within the HLL error bound (~1.6% at
    lgk=12). Returns the per-group rows plus one ('__total__', ...) row.

    Contrast: exact count_distinct re-shuffles raw values per rollup
    level; approx_count_distinct gives per-group estimates but no
    reusable sketch to merge later or across jobs."""
    per = df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("__sk")
    )
    per_rows = per.select(
        *group_cols,
        F.hll_sketch_estimate("__sk").cast("long").alias("approx_distinct"),
    )
    total = per.agg(F.hll_union_agg("__sk").alias("__sk")).select(
        *[F.lit(total_label).alias(c) for c in group_cols],
        F.hll_sketch_estimate("__sk").cast("long").alias("approx_distinct"),
    )
    return per_rows.unionByName(total)


def mergeable_distinct_audit(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    lgk: int = 12,
    sigma: float = 3.0,
    total_label: str = "__total__",
) -> DataFrame:
    """Error-bound audit of ``mergeable_distinct``: per group (plus the
    sketch-UNION total row) emit the EXACT distinct count alongside a
    boolean ``hll_within_bound`` = |HLL estimate − exact| ≤ sigma ·
    (1.04/√2^lgk) · exact — the analytic HLL relative-standard-error
    bound (Flajolet et al.; ~1.6% at lgk=12, so ~4.9% at 3σ).

    This is the agreement-gate-in-SQL shape: an ANSI oracle computes the
    same exact counts with ``TRUE`` literals, so a value-hash match
    PROVES the sketch estimates sat inside the analytic envelope — the
    engine-specific register values never need to cross engines. The
    total row still comes from unioning the per-group sketch bytes (not
    a rescan), so the mergeability contract is what's being audited."""
    per = df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("__sk"),
        F.count_distinct(F.col(col)).alias("exact_distinct"),
    )
    bound = sigma * 1.04 / float(2 ** (lgk / 2.0))
    within = (
        F.abs(F.hll_sketch_estimate("__sk") - F.col("exact_distinct"))
        <= F.col("exact_distinct") * F.lit(bound)
    ).alias("hll_within_bound")
    per_rows = per.select(*group_cols, "exact_distinct", within)
    merged = per.agg(F.hll_union_agg("__sk").alias("__sk"))
    exact_total = df.agg(F.count_distinct(F.col(col)).alias("exact_distinct"))
    total_row = merged.crossJoin(exact_total).select(
        *[F.lit(total_label).alias(c) for c in group_cols],
        "exact_distinct",
        within,
    )
    return per_rows.unionByName(total_row)


# all 64 single-bit long masks as signed-64 literals (1<<63 wraps
# negative): F.shiftleft only takes a static shift amount, so runtime
# bit selection is an element_at into this array instead
_BIT_MASKS = [(1 << b) - (1 << 64) if b == 63 else (1 << b) for b in range(64)]


def _bit_mask(bit: Column) -> Column:
    return F.element_at(F.lit(_BIT_MASKS), bit.cast("int") + 1)


def _bloom_positions(key: Column, k: int, m_bits: int) -> Column:
    """Kirsch-Mitzenmacher double hashing: pos_i = (h1 + i*h2) mod m —
    k bit positions from two xxhash64 evaluations, all JVM-side."""
    h1 = F.xxhash64(key)
    h2 = F.xxhash64(F.lit("__bloom_salt__"), key)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(h1 + i * h2, F.lit(m_bits)),
    )


def bloom_filter_build(
    dim: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 5
) -> list[int]:
    """Build a Bloom bitmap (as ``m_bits/64`` longs) from a dimension
    key column. Distributed OR: each key explodes to k (word, bit)
    pairs, one groupBy on the word index bit_or's them, and only the
    word array (m_bits/64 longs — 128 KiB at the 1M-bit default) ever
    reaches the driver. Catalyst's own runtime bloom (AQE
    spark.sql.optimizer.runtime.bloomFilter) covers the automatic case;
    this explicit form serves engine paths that join AFTER
    transformations AQE can't see through, and its bitmap is reusable
    across queries."""
    if k <= 0 or m_bits < 64 or m_bits % 64:
        raise ValueError(
            f"need k > 0 and m_bits a positive multiple of 64, got {k}, {m_bits}"
        )
    pos = _bloom_positions(F.col(key), k, m_bits)
    words = (
        dim.select(F.explode(pos).alias("__p"))
        .select(
            (F.col("__p") / 64).cast("int").alias("__w"),
            _bit_mask(F.col("__p") % 64).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["__w"]] = r["__bits"]
    return bitmap


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a Bloom pre-filter on the fact side: rows whose key
    can't be in ``dim`` are dropped BEFORE the join's shuffle. At 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling only the ~matching fraction — the classic semi-join
    reduction with O(m_bits) driver state instead of a full key set.

    No false negatives (every true match survives — the join result is
    IDENTICAL to the plain join; oracle-checked), only false positives
    (wasted shuffle rows, rate ~(1-e^{-kn/m})^k), so correctness never
    depends on the bitmap. The bitmap rides into the filter as an array
    literal: zero extra exchanges on the fact side (plan-pinned).

    When to use (measured, BENCH.md): on local[32] the probe CPU
    (~165 ns/row: 2 xxhash64 + k modular bit tests) costs MORE than the
    in-memory shuffle it avoids — 3.1 s vs 1.1 s on a 12M-row A/B with
    broadcast disabled — so this op is for real clusters where shuffle
    means network serialization of the full fact row, not for
    single-node runs (and never when the dim side broadcasts: the hash
    probe of a broadcast join is already cheaper than the bloom test)."""
    dk = dim_key or key
    bitmap = bloom_filter_build(dim, dk, m_bits=m_bits, k=k)
    # ONE py4j call: F.lit(list) round-trips py4j per element — measured
    # 11 s of pure driver time for a 2^20-bit bitmap (16K longs); the
    # SQL-text literal parses JVM-side in ~10 ms and folds identically
    lit_bitmap = F.expr("array(" + ",".join(f"{w}L" for w in bitmap) + ")")
    # the k probes unroll into plain scalar conjunctions: higher-order
    # functions (transform/forall) run INTERPRETED per row — measured
    # ~6 s over 12M rows where the unrolled codegen form is sub-second
    h1 = F.xxhash64(F.col(key))
    h2 = F.xxhash64(F.lit("__bloom_salt__"), F.col(key))
    hit = F.lit(True)
    for i in range(k):
        p = F.pmod(h1 + i * h2, F.lit(m_bits))
        hit = hit & (
            F.element_at(lit_bitmap, (p / 64).cast("int") + 1).bitwiseAND(
                _bit_mask(p % 64)
            )
            != 0
        )
    pruned = fact.filter(hit)
    cond = pruned[key] == dim[dk]
    return pruned.join(dim, cond, how)


def cms_build(
    df: DataFrame, key_col: str, width: int = 2048, depth: int = 5
) -> DataFrame:
    """Build a count-min sketch of a key column as a SPARSE DataFrame of
    (``__row``, ``__col``, ``__n``) cells — the frequency analog of the
    HLL sketch above. Each key increments ``depth`` cells (one per hash
    row, Kirsch-Mitzenmacher positions); a cell's count is the sum of
    everything hashing there, so estimates only ever OVER-count.

    Kept sparse on purpose: the populated-cell count is bounded by
    width*depth (a few thousand rows) regardless of input size, merges
    are a plain union + sum-groupBy (``cms_merge``), and the sketch can
    be persisted/reused across jobs like any table. One explode + one
    groupBy over the input — map-side partial aggs absorb the depth-x
    fan-out."""
    if width <= 0 or depth <= 0:
        raise ValueError(f"width and depth must be positive, got {width}, {depth}")
    key = F.col(key_col).cast("string")
    h1 = F.xxhash64(key)
    h2 = F.xxhash64(F.lit("__cms_salt__"), key)
    # static unrolled array, not transform(sequence(...)): HOFs evaluate
    # interpreted per row, and this runs once per INPUT row (see the
    # bloom A/B in BENCH.md)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), F.pmod(h1 + r * h2, F.lit(width)).alias("c")
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("__cell"))
        .groupBy(
            F.col("__cell.r").alias("__row"), F.col("__cell.c").alias("__col")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME (width, depth):
    cell-wise sum — the linearity that makes CMS shard-friendly."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("__row", "__col").agg(F.sum("__n").alias("__n"))


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int = 5
) -> DataFrame:
    """Join-cardinality estimate from two count-min sketches over the
    same (width, depth): the equi-join's output size is the inner
    product ``sum_k fA(k) * fB(k)``, estimated as the MIN over hash
    rows of the cell-wise product sum (the AMS/CMS inner-product
    estimator). Never underestimates — every true (kA, kB) match lands
    in a shared cell on every row — and overshoots by at most
    ``eps * |A| * |B|`` per the CMS guarantee. The cost-based-planner
    use case: size a join from two sketch tables (each width*depth
    cells, mergeable across shards) without touching either input.

    A hash row with NO overlapping cells has inner product 0, so absent
    rows are restored as zeros before the min. Returns one row
    ``(est_join_size)``."""
    if depth <= 0:
        raise ValueError(f"depth must be positive, got {depth}")
    j = sketch_a.select(
        "__row", "__col", F.col("__n").alias("__na")
    ).join(
        sketch_b.select("__row", "__col", F.col("__n").alias("__nb")),
        ["__row", "__col"],
    )
    per_row = j.groupBy("__row").agg(
        F.sum(F.col("__na") * F.col("__nb")).alias("__ip")
    )
    spark = sketch_a.sparkSession
    rows = spark.range(depth).select(F.col("id").cast("int").alias("__row"))
    return (
        rows.join(per_row, "__row", "left")
        .agg(
            F.min(F.coalesce(F.col("__ip"), F.lit(0)))
            .cast("long")
            .alias("est_join_size")
        )
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 2048, depth: int = 5
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a sketch: the min over
    the key's ``depth`` cells (absent cell = 0). Returns
    (key_col, est_count); est >= true count always, and
    est <= true + eps*N with prob 1-delta for eps=e/width,
    delta=e^-depth. The probe explodes depth rows per key and left-joins
    the sparse cells — sketch-sized, not corpus-sized, work."""
    key = F.col(key_col).cast("string")
    h1 = F.xxhash64(key)
    h2 = F.xxhash64(F.lit("__cms_salt__"), key)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), F.pmod(h1 + r * h2, F.lit(width)).alias("c")
            )
            for r in range(depth)
        ]
    )
    probes = keys.select(key_col, F.explode(cells).alias("__cell")).select(
        key_col, F.col("__cell.r").alias("__row"), F.col("__cell.c").alias("__col")
    )
    return (
        probes.join(sketch, ["__row", "__col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("__n"), F.lit(0))).alias("est_count"))
    )


def key_skew_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Partition-planning skew diagnostics: for each candidate join/agg
    key column, the row count, distinct-key count, and the hottest
    key's count and share — the number that decides between a plain
    hash join, salting, and a broadcast (a top1_share near 1/shuffle-
    partitions or above means one task owns the key).

    One stacked explode (row x len(cols) — len(cols) is small) feeds a
    single (column, value) count aggregate; per-column rollup and a
    deterministic hottest-key pick (max count, ties broken by the
    smallest value string) are two more tiny aggregates over the
    count table, which is distinct-values-sized, not corpus-sized.

    Returns ``(column, n_rows, n_distinct, top1_value, top1_count,
    top1_share)``.
    """
    if not cols:
        raise ValueError("key_skew_report needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns absent from the frame: {missing}")
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("__s")
    ).select(F.col("__s.column"), F.col("__s.v"))
    counts = stacked.groupBy("column", "v").agg(F.count(F.lit(1)).alias("__n"))
    per_col = counts.groupBy("column").agg(
        F.sum("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("__n").alias("top1_count"),
    )
    top_val = (
        counts.join(
            per_col.select("column", F.col("top1_count").alias("__n")),
            ["column", "__n"],
        )
        .groupBy("column")
        .agg(F.min("v").alias("top1_value"))
    )
    return per_col.join(top_val, "column").select(
        "column",
        "n_rows",
        "n_distinct",
        "top1_value",
        "top1_count",
        (F.col("top1_count") / F.col("n_rows")).alias("top1_share"),
    )


def quantile_sketch_build(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    b: int = 128,
    seed: int = 42,
) -> DataFrame:
    """Mergeable quantile sketch per group: keep the ``b`` rows with the
    lowest deterministic hash rank (``h60(seed:id)``, ties by id) — a
    bottom-k/KMV-style uniform sample WITHOUT replacement whose
    membership is a pure function of (seed, id), so two engines (and
    two shards) agree on the sample bit-for-bit. Quantiles interpolate
    over the sample with the usual quantile_cont semantics; error is
    the sampling error, ~sqrt(p(1-p)/b) in rank terms.

    Why this over percentile_approx: the sketch is a first-class TABLE
    (persist it, ship it, merge it across days with
    ``quantile_sketch_merge`` — bottom-k of a union IS the bottom-k of
    the unions' bottom-k's, an exact identity) and its estimates are
    deterministically reproducible cross-engine, which the JVM's
    internal KLL buffers are not.

    Scale note (grouped): the window sorts each group only to drop all
    but b rows; for hot groups add the quota_sample prefilter-overshoot
    trick (threshold on the SAME rank value) before the window. The
    GLOBAL sketch (no group_cols) deliberately avoids a
    constant-partitioned window — that shape funnels the whole corpus
    through one partition (Catalyst's group-limit inference needs a
    real partition key; pinned in tests/test_plan_shape.py). It is
    instead one orderBy().limit(b) (TakeOrderedAndProject: per-task
    b-heaps, driver merge) plus one 1-row count aggregate.

    Returns ``(*group_cols, n_rows, ranks array<long>,
    samples array<double>)`` with the arrays co-sorted by rank.
    """
    if b < 2:
        raise ValueError(f"b must be >= 2, got {b}")
    gcols = list(group_cols or [])
    rank = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    staged = df.select(
        *gcols,
        F.col(value_col).cast("double").alias("__v"),
        rank.alias("__rk"),
        F.col(id_col).alias("__id"),
    )
    pairs = F.array_sort(F.collect_list(F.struct("__rk", "__v")))
    if gcols:
        wp = Window.partitionBy(*gcols)
        w = wp.orderBy(F.col("__rk").asc(), F.col("__id").asc())
        kept = staged.select(
            *gcols,
            "__v",
            "__rk",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(wp).alias("__n"),
        ).filter(F.col("__rn") <= b)
        return kept.groupBy(*gcols).agg(
            F.max("__n").alias("n_rows"),
            F.transform(pairs, lambda s: s["__rk"]).alias("ranks"),
            F.transform(pairs, lambda s: s["__v"]).alias("samples"),
        )
    kept = staged.orderBy(F.col("__rk").asc(), F.col("__id").asc()).limit(b)
    total = df.select(F.count(F.lit(1)).alias("n_rows"))
    return kept.agg(
        F.transform(pairs, lambda s: s["__rk"]).alias("ranks"),
        F.transform(pairs, lambda s: s["__v"]).alias("samples"),
    ).crossJoin(F.broadcast(total)).select("n_rows", "ranks", "samples")


def quantile_sketch_merge(a: DataFrame, b_df: DataFrame, b: int = 128) -> DataFrame:
    """Merge two sketches built with the same (b, seed) over disjoint
    row sets: concatenate the (rank, value) pairs, keep the b lowest
    ranks, sum the row counts. Exactly equals building one sketch over
    the union — the bottom-k identity (pytest-pinned)."""
    gcols = [c for c in a.columns if c not in ("n_rows", "ranks", "samples")]
    u = a.unionByName(b_df)
    zipped = F.arrays_zip(F.col("ranks"), F.col("samples"))
    per_group = u.groupBy(*gcols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.slice(
            F.array_sort(F.flatten(F.collect_list(zipped))), 1, b
        ).alias("__pairs"),
    )
    return per_group.select(
        *gcols,
        "n_rows",
        F.transform(F.col("__pairs"), lambda s: s["ranks"]).alias("ranks"),
        F.transform(F.col("__pairs"), lambda s: s["samples"]).alias("samples"),
    )


def quantile_sketch_estimate(
    sketch: DataFrame, probs: list[float]
) -> DataFrame:
    """Quantile estimates from a sketch: quantile_cont interpolation
    over the sample values (one explode over b-bounded arrays — sketch-
    sized work). Returns ``(*group_cols, n_rows, q_<p> ...)``."""
    if not probs:
        raise ValueError("need at least one probability")
    gcols = [c for c in sketch.columns if c not in ("n_rows", "ranks", "samples")]
    ex = sketch.select(
        *gcols, "n_rows", F.explode("samples").alias("__v")
    )
    aggs = [
        F.percentile(F.col("__v"), F.lit(p)).alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return ex.groupBy(*gcols, "n_rows").agg(*aggs)


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 8,
) -> DataFrame:
    """Z-order (Morton) key over numeric columns — the multi-dimensional
    data-layout key a lakehouse sorts files by so that range predicates
    on ANY of the dimensions skip files (the Delta/Iceberg OPTIMIZE
    ZORDER practice; Morton 1966). Each column is min-max normalized to
    a ``bits_per_dim``-bit integer grid (the min/max ride a broadcast
    1-row aggregate — never a driver collect), and the per-dimension
    bits interleave into one ``zkey``: rows close in every dimension
    land close on the curve, so a range-partition by zkey gives every
    dimension locality at once — ONE layout serving D predicate
    columns, where sorting by a column list serves only its prefix.

    Pure Column arithmetic (floor/shift/or) — deterministic,
    SQL-replayable, no UDF. NULLs in any key column map to grid cell 0
    (sort to the curve's origin, and a file-skipping min/max on the
    zkey still prunes them). Appends ``zkey`` (long); partition the
    output with ``repartitionByRange('zkey')`` + a sortWithinPartitions
    to materialize the layout.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if not 1 <= bits_per_dim <= 20:
        raise ValueError(f"bits_per_dim must be in [1, 20], got {bits_per_dim}")
    if len(cols) * bits_per_dim > 60:
        raise ValueError(
            f"{len(cols)} dims x {bits_per_dim} bits exceeds the 60-bit zkey"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(stats))
    grid_max = (1 << bits_per_dim) - 1
    cells = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"__mn_{i}"), F.col(f"__mx_{i}")
        span = mx - mn
        # degenerate dimension (constant column) pins to cell 0; the
        # interleave below still spreads the other dimensions
        norm = F.when(
            span > 0,
            F.floor(
                (F.col(c).cast("double") - mn) / span * F.lit(float(grid_max))
            ),
        ).otherwise(F.lit(0))
        cells.append(
            F.coalesce(norm, F.lit(0)).cast("long").alias(f"__cell_{i}")
        )
    out = out.select(*df.columns, *cells)
    zkey = F.lit(0).cast("long")
    for b in range(bits_per_dim):
        for i in range(len(cols)):
            bit = F.shiftright(F.col(f"__cell_{i}"), b).bitwiseAND(F.lit(1))
            zkey = zkey.bitwiseOR(
                F.shiftleft(bit, b * len(cols) + i).cast("long")
            )
    return out.select(*df.columns, zkey.alias("zkey"))


def merge_additive_rollup(
    cube: DataFrame,
    delta: DataFrame,
    keys: list[str],
    add_cols: list[str],
) -> DataFrame:
    """Incremental materialized-view maintenance for ADDITIVE rollups
    (counts, sums — the self-maintainable aggregate class): merge a
    delta batch's partial aggregates into an existing cube with one
    full-outer join and per-column coalesce-adds. The maintenance
    identity ``merge(agg(base), agg(delta)) == agg(base ∪ delta)``
    holds exactly for integer adds and to FP-accumulation order for
    double sums (same class of noise as any distributed sum — round at
    read time, the repo-wide 6-dp convention).

    This is the daily-refresh shape a 100 TB metrics cube runs: O(delta)
    aggregation + a join bounded by |cube| + |delta groups| — the base
    DATA is never re-read (the dedup_minhash_incremental argument, for
    aggregates). Non-additive aggregates (count-distinct, quantiles)
    need mergeable sketches instead — see ``mergeable_distinct`` /
    ``quantile_sketch_merge``.
    """
    if not keys or not add_cols:
        raise ValueError("merge_additive_rollup needs keys and add_cols")
    renamed = delta.select(
        *[F.col(k).alias(f"__d_{k}") for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in add_cols],
    )
    # NULL-SAFE key equality: groupBy legitimately emits NULL-key groups,
    # and a plain full-outer equi-join would leave the two sides' NULL
    # groups unmatched (two rows instead of one sum) — breaking the
    # maintenance identity exactly where dirty data lives
    cond = None
    for k in keys:
        eq = cube[k].eqNullSafe(renamed[f"__d_{k}"])
        cond = eq if cond is None else cond & eq
    merged = cube.join(renamed, cond, "full_outer")
    # NULL-preserving add: SUM over an all-NULL group is NULL, and the
    # identity must reproduce that. Coalesce a side to 0 only when the
    # OTHER side contributes a value; when both sides are NULL (group
    # absent on one side AND/OR an all-NULL sum) the merged aggregate
    # stays NULL — matching the full recompute exactly.
    return merged.select(
        *[F.coalesce(cube[k], F.col(f"__d_{k}")).alias(k) for k in keys],
        *[
            F.when(
                F.col(c).isNull() & F.col(f"__d_{c}").isNull(), F.lit(None)
            )
            .otherwise(
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            )
            .alias(c)
            for c in add_cols
        ],
    )


def zone_map_audit(
    df: DataFrame,
    file_col: str,
    value_col: str,
    pred_lo=None,
    pred_hi=None,
) -> DataFrame:
    """Zone-map (per-file min/max) audit with a data-skipping decision
    — the statistics Delta/Iceberg/parquet footers store per file, and
    the measurement that tells you whether a layout (zorder_key,
    repartitionByRange, natural ingest order) actually PRUNES for a
    given range predicate before you pay to rewrite 100 TB into it:
    per ``file_col`` group (a file id, a range bucket, a partition
    value), ``n_rows``, ``n_nonnull``, ``min_value``/``max_value``,
    and ``can_skip`` — whether a reader evaluating
    ``value_col BETWEEN pred_lo AND pred_hi`` (either bound optional)
    can drop the file on its zone map alone: min > hi, max < lo, or
    the file holds no non-null values (a range predicate is
    null-rejecting). The skipped-row fraction is sum(n_rows where
    can_skip)/sum(n_rows) — left to the consumer so the per-file rows
    stay the auditable artifact.

    The decision uses the column's native type (no float round-trip) —
    exact for integers/strings/timestamps, and for doubles identical
    to what a footer-stats reader computes.

    Scale shape: ONE map-side-combinable groupBy to one row per file —
    min/max/count are all partial-aggregatable, so at 100 TB this is a
    scan plus a tiny shuffle of per-file partials; no window, no
    sort. Compose upstream with zorder_key + a bucket projection to
    audit a PROSPECTIVE layout without writing it."""
    agg = df.groupBy(F.col(file_col).alias("file_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(value_col).cast("long").alias("n_nonnull"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    if pred_lo is None and pred_hi is None:
        skip = F.lit(False)
    else:
        skip = F.col("n_nonnull") == 0
        if pred_hi is not None:
            skip = skip | (F.col("min_value") > F.lit(pred_hi))
        if pred_lo is not None:
            skip = skip | (F.col("max_value") < F.lit(pred_lo))
    return agg.withColumn("can_skip", skip)


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    size_col: str = "size_bytes",
    file_col: str = "file_id",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Small-file compaction planner — the bin-packing pass behind
    Delta/Iceberg ``OPTIMIZE``: group a table-partition's small files
    into rewrite bins of ~``target_bytes`` so a 100 TB table stops
    paying per-file open/footer costs on every scan.

    Packing is next-fit-decreasing expressed as pure prefix-sum
    arithmetic (no sequential driver loop): within each partition,
    files UNDER the target sort by (size desc, file_id), and
    ``bin_id = floor(bytes_before / target_bytes)`` over that order —
    each bin holds at least target_bytes of input once the next bin
    opens, and big-first ordering keeps bins balanced (the classic
    NFD guarantee: no bin except the last is under half-full, and
    overshoot is bounded by one file < target). Files already >=
    ``target_bytes`` get ``bin_id = -1`` / ``action = 'keep'`` —
    rewriting them buys nothing. Single-file bins also degrade to
    ``'keep'`` (a one-file rewrite is a copy).

    Returns one row per file: the partition columns, ``file_col``,
    ``size_col``, ``bin_id``, ``n_bin_files``, ``bin_bytes``, and
    ``action`` ('compact' | 'keep'). All-integer arithmetic —
    bit-reproducible in the SQL oracle.

    Scale shape: the input is a file MANIFEST (one row per file — a
    100 TB table is ~1e5-1e7 rows here, metadata-scale), so cost is
    negligible next to the rewrites it plans. Both windows key on the
    partition columns, so planning parallelizes per table-partition
    and there is NO global single-partition funnel; Catalyst reuses
    one hash exchange for both (the bin window's clustering keys are
    a superset of the pack window's). Plan-pinned in
    tests/test_plan_shape.py.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    parts = list(partition_cols or [])
    pcols = [F.col(c) for c in parts]
    size = F.col(size_col).cast("long")
    w_pack = Window.partitionBy(*pcols).orderBy(
        size.desc(), F.col(file_col).asc()
    )
    small = files.filter(size < target_bytes).select(
        *parts,
        F.col(file_col),
        size.alias(size_col),
        F.floor(
            (F.sum(size).over(w_pack) - size).cast("double") / F.lit(target_bytes)
        )
        .cast("long")
        .alias("bin_id"),
    )
    w_bin = Window.partitionBy(*(pcols + [F.col("bin_id")]))
    binned = small.select(
        "*",
        F.count(F.lit(1)).over(w_bin).cast("long").alias("n_bin_files"),
        F.sum(size).over(w_bin).cast("long").alias("bin_bytes"),
    ).select(
        *parts,
        file_col,
        size_col,
        "bin_id",
        "n_bin_files",
        "bin_bytes",
        F.when(F.col("n_bin_files") > 1, F.lit("compact"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )
    large = files.filter(size >= target_bytes).select(
        *parts,
        F.col(file_col),
        size.alias(size_col),
        F.lit(-1).cast("long").alias("bin_id"),
        F.lit(1).cast("long").alias("n_bin_files"),
        size.alias("bin_bytes"),
        F.lit("keep").alias("action"),
    )
    return binned.unionByName(large)
