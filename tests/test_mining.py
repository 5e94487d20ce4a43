"""Market-basket frequent pairs + PassJoin edit-distance join:
handcrafted semantics and Python-reference property checks (the sf0.001
oracle comparison lives in test_entry.py)."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from orientdb_spark.mining import frequent_pairs
from orientdb_spark.pipeline.dedup import edit_distance_join


def test_frequent_pairs_counts_and_lift(spark):
    """(a,b) in 2 of 4 baskets; n_a=3, n_b=2 -> lift = 2*4/(3*2)."""
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "d"),
        (2, "a"),  # duplicate item in basket collapses
    ]
    df = spark.createDataFrame(rows, ["bid", "item"])
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_ab"], round(r["lift"], 6), round(r["cosine"], 6),
            round(r["jaccard"], 6),
        )
        for r in frequent_pairs(df, "bid", "item", min_support=2).collect()
    }
    assert got == {
        ("a", "b"): (
            2,
            round(2 * 4 / (3 * 2), 6),
            round(2 / (3 * 2) ** 0.5, 6),
            round(2 / (3 + 2 - 2), 6),
        )
    }
    # min_support=1 admits the single-basket pairs too
    all_pairs = {
        (r["item_a"], r["item_b"]): r["n_ab"]
        for r in frequent_pairs(df, "bid", "item", min_support=1).collect()
    }
    assert all_pairs == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_frequent_pairs_basket_cap_drops_hub(spark):
    """A capped hub basket contributes neither pairs nor denominators."""
    hub = [(9, f"i{k}") for k in range(10)]
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b")] + hub
    df = spark.createDataFrame(rows, ["bid", "item"])
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], round(r["lift"], 6))
        for r in frequent_pairs(
            df, "bid", "item", min_support=2, max_basket_size=5
        ).collect()
    }
    # universe = 2 surviving baskets, both containing {a,b}: lift 1*2/(1*1)... n=2
    assert got == {("a", "b"): (2, round(2 * 2 / (2 * 2), 6))}


def test_frequent_pairs_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["bid", "item"])
    with pytest.raises(ValueError):
        frequent_pairs(df, "bid", "item", min_support=0)
    with pytest.raises(ValueError):
        frequent_pairs(df, "bid", "item", max_basket_size=1)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_edit_distance_join_property_vs_bruteforce(spark):
    """Random short strings over a 2-letter alphabet (maximizing
    collisions, including empty strings) at k=1 and k=2: the PassJoin
    candidates + residual must equal the exact quadratic answer."""
    rng = random.Random(11)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(rng.randrange(0, 7))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for k in (1, 2):
        want = {
            (i, j, _lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= k
        }
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_join(df, max_dist=k).collect()
        }
        assert got == want, k


def test_edit_distance_join_finds_each_edit_kind(spark):
    """Substitution, insertion, deletion, and an out-of-range pair."""
    rows = [
        (1, "kitten"), (2, "mitten"),      # substitution
        (3, "kittens"),                    # insertion vs 1
        (4, "kitte"),                      # deletion vs 1
        (5, "xyzzy"),                      # far from everything
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(df, max_dist=1).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (1, 4): 1}


def test_edit_distance_join_candidates_are_equi_join(spark):
    """The main candidate path must plan as a hash/sort-merge equi-join
    on the segment key — the whole point of the signature scheme."""
    df = spark.createDataFrame(
        [(i, f"string number {i}") for i in range(20)], ["doc_id", "text"]
    )
    out = edit_distance_join(df, max_dist=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_edit_distance_join_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        edit_distance_join(df, max_dist=0)


def test_simhash_hamming_pairs_vs_bruteforce(spark):
    """The block-join candidates + residual must equal the quadratic
    answer over the simhash values, at two distances."""
    from orientdb_spark.pipeline.dedup import simhash, simhash_hamming_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=48).collect()}
    for k in (1, 3):
        want = {
            (a, b, bin(sh[a] ^ sh[b]).count("1"))
            for a in sh
            for b in sh
            if a < b and bin(sh[a] ^ sh[b]).count("1") <= k
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_hamming_pairs(docs, bits=48, max_hamming=k).collect()
        }
        assert got == want, k


def test_simhash_hamming_validation(spark):
    from orientdb_spark.pipeline.dedup import simhash_hamming_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(5)
    with pytest.raises(ValueError):
        simhash_hamming_pairs(docs, max_hamming=0)
    with pytest.raises(ValueError):
        simhash_hamming_pairs(docs, bits=3, max_hamming=3)
