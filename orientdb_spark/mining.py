"""Market-basket co-occurrence mining: frequent item pairs + lift.

The 2010 reference has no mining surface; this is the Spark-first
formulation of the classic association-rule building block (the
pairwise core of Apriori/FP-growth) for basket-shaped data — items
co-occurring in an order, tags on a document, features in a session.

Shape discipline: baskets collapse to ONE row each (collect_set), pairs
expand IN-ROW from the sorted item array (the same bounded
flatten/transform expansion as the LSH bucket pairs in
pipeline/dedup.py), so the shuffle carries one row per basket, never one
row per pair. Pair counts and item counts are two partial-agg groupBys;
the basket total rides in as a broadcast 1-row crossJoin (the TF-IDF
corpus-size pattern). A ``max_basket_size`` cap bounds the quadratic
in-row expansion for degenerate hub baskets at scale — capped baskets
are dropped, the standard market-basket hygiene (a 10k-item basket says
nothing about pairwise affinity anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["frequent_pairs"]


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Unordered item pairs co-occurring in >= ``min_support`` baskets,
    scored three ways from the same counts: lift = P(a,b)/(P(a)P(b))
    (association strength), cosine = n_ab/sqrt(n_a*n_b) (the item-item
    collaborative-filtering similarity), and jaccard =
    n_ab/(n_a+n_b-n_ab) (overlap). All pure arithmetic over
    (n_ab, n_a, n_b, N) — no extra passes.

    Returns ``(item_a, item_b, n_ab, lift, cosine, jaccard)`` with
    ``item_a < item_b``. Item membership is per-basket distinct
    (quantity ignored); denominators count each item's surviving
    baskets.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_basket_size is not None and max_basket_size < 2:
        raise ValueError(
            f"max_basket_size must be >= 2, got {max_basket_size}"
        )
    b = df.select(
        F.col(basket_col).alias("__bid"), F.col(item_col).alias("__item")
    ).dropDuplicates()
    baskets = b.groupBy("__bid").agg(
        F.array_sort(F.collect_set("__item")).alias("__items")
    )
    if max_basket_size is not None:
        baskets = baskets.filter(F.size("__items") <= max_basket_size)
    # the basket aggregate feeds three plan branches (pairs, item
    # counts, basket total); checkpoint it once or each branch re-scans
    # and re-aggregates the input — measured 3x the scans without this
    baskets = baskets.localCheckpoint(eager=False)
    items = F.col("__items")
    pair_structs = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(items, i + F.lit(2), F.size(items) - i - F.lit(1)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("__p"))
        .select(F.col("__p.item_a"), F.col("__p.item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    # item counts over the SURVIVING baskets, so lift's numerator and
    # denominators share one universe when the cap drops hub baskets
    ic = (
        baskets.select(F.explode("__items").alias("__item"))
        .groupBy("__item")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    nb = baskets.agg(
        F.count(F.lit(1)).cast("double").alias("__n_baskets")
    )
    return (
        pairs.join(
            ic.select(F.col("__item").alias("item_a"), F.col("__n").alias("__na")),
            "item_a",
        )
        .join(
            ic.select(F.col("__item").alias("item_b"), F.col("__n").alias("__nb")),
            "item_b",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            (
                F.col("n_ab") * F.col("__n_baskets")
                / (F.col("__na") * F.col("__nb"))
            ).alias("lift"),
            (
                F.col("n_ab") / F.sqrt(F.col("__na") * F.col("__nb"))
            ).alias("cosine"),
            (
                F.col("n_ab") / (F.col("__na") + F.col("__nb") - F.col("n_ab"))
            ).alias("jaccard"),
        )
    )
