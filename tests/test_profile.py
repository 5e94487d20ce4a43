"""Column profiler unit tests (the oracle twin runs in test_entry.py)."""

import pytest
from pyspark.sql import functions as F

from orientdb_spark.pipeline.profile import profile_columns


@pytest.fixture(scope="module")
def mixed(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5, True),
            (2, "b", None, False),
            (3, None, -0.25, None),
            (3, "a", 1.5, True),
        ],
        "i BIGINT, s STRING, d DOUBLE, b BOOLEAN",
    )


def test_profile_values(mixed):
    rows = {r["column"]: r for r in profile_columns(mixed).collect()}
    assert set(rows) == {"i", "s", "d", "b"}
    i = rows["i"]
    assert (i["n_rows"], i["n_nonnull"], i["n_distinct"]) == (4, 4, 3)
    assert (i["min_num"], i["max_num"]) == (1.0, 3.0)
    assert i["min_str"] is None and i["max_str"] is None
    s = rows["s"]
    assert (s["n_nonnull"], s["n_distinct"]) == (3, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None
    d = rows["d"]
    assert (d["n_nonnull"], d["n_distinct"]) == (3, 2)
    assert (d["min_num"], d["max_num"]) == (-0.25, 1.5)
    b = rows["b"]  # booleans profile as 0/1 numerics
    assert (b["n_nonnull"], b["n_distinct"]) == (3, 2)
    assert (b["min_num"], b["max_num"]) == (0.0, 1.0)


def test_profile_rejects_unknown_and_complex(mixed, spark):
    with pytest.raises(ValueError):
        profile_columns(mixed, ["nope"])
    arr = spark.createDataFrame([([1, 2],)], "a ARRAY<INT>")
    with pytest.raises(ValueError):
        profile_columns(arr, ["a"])
    with pytest.raises(ValueError):
        profile_columns(arr)  # no profilable columns at all


def test_profile_single_scan_single_agg(mixed):
    """The scale claim: one aggregate over one scan, no join of
    per-column subqueries."""
    plan = profile_columns(mixed, ["i", "s"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") + plan.count("Relation") <= 2  # one source
    assert "Join" not in plan


def test_profile_approx_mode_runs(mixed):
    rows = {r["column"]: r for r in profile_columns(mixed, approx=True).collect()}
    # HLL at rsd=0.01 is exact on tiny cardinalities
    assert rows["i"]["n_distinct"] == 3


def test_fk_orphans_detects_dangling_keys(spark):
    from orientdb_spark.pipeline.profile import fk_orphans

    child = spark.createDataFrame(
        [(1,), (2,), (3,), (99,), (None,)], "k BIGINT"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk BIGINT")
    out = fk_orphans([("c.k", child, "k", parent, "pk")]).collect()
    assert len(out) == 1
    r = out[0]
    # the null FK is excluded from both counts; 99 is the one orphan
    assert (r["relation"], r["n_child"], r["n_orphans"]) == ("c.k", 4, 1)


def test_fk_orphans_multiple_relations(spark):
    from orientdb_spark.pipeline.profile import fk_orphans

    a = spark.createDataFrame([(1,), (2,)], "k BIGINT")
    p = spark.createDataFrame([(1,)], "pk BIGINT")
    out = {
        r["relation"]: r["n_orphans"]
        for r in fk_orphans(
            [("r1", a, "k", p, "pk"), ("r2", p, "pk", a, "k")]
        ).collect()
    }
    assert out == {"r1": 1, "r2": 0}


def test_histogram_degenerate_and_max_edge(spark):
    from orientdb_spark.pipeline.profile import histogram

    # constant column: everything in bin 0, no divide-by-zero
    const = spark.createDataFrame([(5.0,)] * 4, ["x"])
    got = histogram(const, "x", bins=10).collect()
    assert len(got) == 1 and got[0]["bin"] == 0 and got[0]["n"] == 4

    # the max value folds into the LAST bin, not a phantom bins-th bin
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], ["x"])
    rows = {r["bin"]: r for r in histogram(df, "x", bins=10).collect()}
    assert set(rows) == {0, 5, 9}
    assert rows[9]["n"] == 1 and rows[9]["bin_hi"] == 10.0
    assert rows[0]["bin_lo"] == 0.0 and rows[0]["bin_hi"] == 1.0


def test_histogram_counts_sum_to_rowcount(spark):
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.profile import histogram

    df = spark.range(0, 1000).select((F.col("id") % 97).cast("double").alias("x"))
    got = histogram(df, "x", bins=7).collect()
    assert sum(r["n"] for r in got) == 1000


def test_json_profile_dynamic_keys_and_types(spark):
    from orientdb_spark.pipeline.profile import json_profile

    rows = [
        ('{"a": 1, "b": "x"}',),
        ('{"a": 2.5, "c": "7"}',),
        ('{"b": "x"}',),
    ]
    df = spark.createDataFrame(rows, ["j"])
    got = {r["key"]: (r["n_present"], r["n_distinct_values"], r["n_numeric"])
           for r in json_profile(df, "j").collect()}
    # a: two numeric values; b: one distinct string twice; c: numeric-ish string
    assert got == {"a": (2, 2, 2), "b": (2, 1, 0), "c": (1, 1, 1)}


def test_json_profile_malformed_rows_contribute_nothing(spark):
    from orientdb_spark.pipeline.profile import json_profile

    df = spark.createDataFrame([("not json",), ('{"k": 1}',), (None,)], ["j"])
    got = json_profile(df, "j").collect()
    assert len(got) == 1 and got[0]["key"] == "k" and got[0]["n_present"] == 1


def test_k_anonymity_flags_small_classes(spark):
    from orientdb_spark.pipeline.profile import k_anonymity

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)]
    df = spark.createDataFrame(rows, ["q1", "q2"])
    got = {(r["q1"], r["q2"]): (r["class_size"], r["violates_k"])
           for r in k_anonymity(df, ["q1", "q2"], k=3).collect()}
    assert got == {("a", 1): (5, False), ("a", 2): (2, True), ("b", 1): (1, True)}


def test_l_diversity_flags_homogeneous_classes(spark):
    """A k-anonymous class with one sensitive value must violate l=2;
    NULL counts as its own sensitive value; top_sensitive_n is the
    modal count."""
    import pytest

    from orientdb_spark.pipeline.profile import l_diversity

    rows = (
        [("a", "flu")] * 4                       # homogeneous -> violates
        + [("b", "flu"), ("b", "cold"), ("b", "cold")]  # diverse
        + [("c", None), ("c", "flu")]            # NULL is a value
    )
    df = spark.createDataFrame(rows, ["q", "s"])
    got = {
        r["q"]: (
            r["class_size"], r["l_distinct"],
            r["top_sensitive_n"], r["violates_l"],
        )
        for r in l_diversity(df, ["q"], "s", l=2).collect()
    }
    assert got == {
        "a": (4, 1, 4, True),
        "b": (3, 2, 2, False),
        "c": (2, 2, 1, False),
    }
    with pytest.raises(ValueError, match="l must be >= 1"):
        l_diversity(df, ["q"], "s", l=0)
    with pytest.raises(ValueError, match="quasi-identifier"):
        l_diversity(df, [], "s")


def test_stat_drift_surfaces_injected_shift(spark):
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.profile import stat_drift

    old = spark.createDataFrame([(float(i), "x") for i in range(10)], ["v", "s"])
    new = old.select((F.col("v") + 2.0).alias("v"),
                     F.when(F.col("v") < 5, F.col("s")).alias("s"))
    got = {r["column"]: r for r in stat_drift(old, new, ["v", "s"]).collect()}
    assert got["v"]["mean_shift"] == 2.0
    assert got["v"]["old_null_frac"] == 0.0 and got["v"]["new_null_frac"] == 0.0
    assert got["s"]["new_null_frac"] == 0.5 and got["s"]["old_null_frac"] == 0.0
    assert got["s"]["old_mean"] is None  # non-numeric column


def test_quantile_bins_quartiles_balanced(spark):
    """1..8 cuts into four 2-row bins with contiguous ranges; a value
    equal to a cutpoint closes the lower bin."""
    from orientdb_spark.pipeline.profile import quantile_bins

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 9)], ["value"]
    )
    got = {
        r["bin"]: (r["n_rows"], r["lo"], r["hi"])
        for r in quantile_bins(df, "value", q=4).collect()
    }
    assert got == {
        1: (2, 1.0, 2.0),
        2: (2, 3.0, 4.0),
        3: (2, 5.0, 6.0),
        4: (2, 7.0, 8.0),
    }


def test_quantile_bins_ties_can_starve_a_bin(spark):
    """A massively tied distribution collapses cutpoints; the starved
    bin is absent, members pile into the lowest bin that contains the
    tie value."""
    from orientdb_spark.pipeline.profile import quantile_bins

    df = spark.createDataFrame(
        [(5.0,)] * 10 + [(9.0,)], ["value"]
    )
    got = {r["bin"]: r["n_rows"] for r in quantile_bins(df, "value", q=4).collect()}
    assert got[1] == 10 and got[4] == 1 and 2 not in got and 3 not in got


def test_quantile_bins_per_group_and_validation(spark):
    from orientdb_spark.pipeline.profile import quantile_bins

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 9)] + [("b", float(100 + i)) for i in range(4)],
        ["g", "value"],
    )
    rows = quantile_bins(df, "value", ["g"], q=2).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], 0)
        by_g[r["g"]] += r["n_rows"]
    assert by_g == {"a": 8, "b": 4}
    # group b's bins only span b's values
    assert all(r["lo"] >= 100 for r in rows if r["g"] == "b")
    import pytest

    with pytest.raises(ValueError):
        quantile_bins(df, "value", ["g"], q=1)


def test_column_entropy_known_values(spark):
    """Uniform k categories -> ln k; constant -> 0; NULL is a category;
    per-group isolation."""
    import math

    from orientdb_spark.pipeline.profile import column_entropy

    rows = (
        [("u", x) for x in ("a", "b", "c", "d")]          # uniform over 4
        + [("k", "z")] * 5                                 # constant
        + [("n", "a"), ("n", None)]                        # null category
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r["g"]: (r["n_rows"], r["n_distinct"], r["entropy"])
        for r in column_entropy(df, "v", ["g"]).collect()
    }
    assert got["k"] == (5, 1, 0.0)
    assert got["u"][0] == 4 and got["u"][1] == 4
    assert abs(got["u"][2] - math.log(4)) < 1e-12
    assert got["n"][1] == 2 and abs(got["n"][2] - math.log(2)) < 1e-12


def test_winsorize_stats_clips_known_tails(spark):
    """1..100 at p05/p95: interpolated fences, ~5 clipped per side, and
    the winsorized mean equals the hand-computed clip."""
    from orientdb_spark.pipeline.profile import winsorize_stats

    vals = [float(i) for i in range(1, 101)]
    df = spark.createDataFrame([(v,) for v in vals], ["value"])
    r = winsorize_stats(df, "value", lo=0.05, hi=0.95).collect()[0]
    p_lo = 1 + 0.05 * 99  # quantile_cont interpolation over 1..100
    p_hi = 1 + 0.95 * 99
    assert abs(r["p_lo"] - p_lo) < 1e-9 and abs(r["p_hi"] - p_hi) < 1e-9
    assert r["n_rows"] == 100
    assert r["n_clipped_lo"] == sum(v < p_lo for v in vals)
    assert r["n_clipped_hi"] == sum(v > p_hi for v in vals)
    clipped = [min(max(v, p_lo), p_hi) for v in vals]
    assert abs(r["mean_winsorized"] - sum(clipped) / 100) < 1e-9
    assert abs(r["mean_raw"] - 50.5) < 1e-9
    import pytest

    with pytest.raises(ValueError):
        winsorize_stats(df, "value", lo=0.5, hi=0.4)


def test_quantile_bins_excludes_nulls(spark):
    """r6 ADVICE: NULL values must not inflate bin 1 — they are
    filtered before binning, so bin counts reflect only real values."""
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.profile import quantile_bins

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 9)] + [(None,), (None,), (None,)],
        "value DOUBLE",
    )
    got = {r["bin"]: r["n_rows"] for r in quantile_bins(df, "value", q=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}
    assert sum(got.values()) == 8  # the 3 NULLs are gone, not in bin 1


# --- dataset card + DP-noised counts (release statistics) --------------------


def test_dataset_card_known_values(spark):
    from orientdb_spark.pipeline import profile

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "a b c", "en", "s1"),   # exact duplicate of 1
            (3, "d e", "de", "s2"),
            (4, "f", "de", "s2"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    card = {(r["section"], r["key"]): r["value"]
            for r in profile.dataset_card(docs).collect()}
    assert card[("corpus", "n_docs")] == 4.0
    assert card[("corpus", "total_ws_tokens")] == 9.0
    assert card[("corpus", "distinct_langs")] == 2.0
    assert card[("corpus", "exact_dup_rate")] == 0.25
    assert card[("lang_share", "en")] == 0.5
    assert card[("source_docs", "s2")] == 2.0
    assert ("length", "p50_chars") in card and ("length", "p90_chars") in card


def test_dp_counts_deterministic_and_scales_with_epsilon(spark):
    from orientdb_spark.pipeline import profile

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["lang"]: r for r in profile.dp_noisy_counts(docs, epsilon=1.0).collect()}
    b = {r["lang"]: r for r in profile.dp_noisy_counts(docs, epsilon=1.0).collect()}
    assert {k: v["noisy_count"] for k, v in a.items()} == {
        k: v["noisy_count"] for k, v in b.items()
    }
    # Laplace(1/eps): noise at eps=10 is exactly a tenth of eps=1 noise
    # (same seeded uniform), up to the 6-dp grid
    c = {r["lang"]: r for r in profile.dp_noisy_counts(docs, epsilon=10.0).collect()}
    for lang, row in a.items():
        n1 = row["noisy_count"] - row["n_true"]
        n10 = c[lang]["noisy_count"] - c[lang]["n_true"]
        assert n1 != 0.0  # noise actually applied
        assert abs(n10 - n1 / 10.0) < 5e-6
    # a different seed moves the noise
    d = {r["lang"]: r for r in
         profile.dp_noisy_counts(docs, epsilon=1.0, seed=7).collect()}
    assert any(d[k]["noisy_count"] != a[k]["noisy_count"] for k in a)


def test_dp_counts_validation(spark):
    import pytest

    from orientdb_spark.pipeline import profile

    docs = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    with pytest.raises(ValueError, match="epsilon"):
        profile.dp_noisy_counts(docs, epsilon=0.0)


def test_dataset_card_approx_removes_exact_percentile_and_countdistinct(spark):
    """approx=True must swap the exact percentile for percentile_approx
    and countDistinct for approx_count_distinct (HLL++) in the corpus
    aggregate — pinned on the lazy plan builder, since dataset_card
    itself returns a lineage-cut (checkpointed) card."""
    from orientdb_spark.pipeline import profile

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    strip = lambda p: p.replace("percentile_approx(", "")  # noqa: E731
    exact = profile._dataset_card_plan(docs, "text", "lang", "source",
                                       False, 10000, 0.01)
    approx = profile._dataset_card_plan(docs, "text", "lang", "source",
                                        True, 10000, 0.01)
    p_exact = exact._jdf.queryExecution().optimizedPlan().toString()
    p_approx = approx._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile(" in strip(p_exact)
    assert "percentile(" not in strip(p_approx)
    assert "percentile_approx(" in p_approx
    assert "approx_count_distinct" in p_approx
    assert "approx_count_distinct" not in p_exact
    exact._ods_per_doc.unpersist()
    approx._ods_per_doc.unpersist()
    # the approx card still carries every section with sane values
    # (HLL++ is exact at these cardinalities; the percentile sketch
    # returns an actual data value instead of an interpolation)
    card = {(r["section"], r["key"]): r["value"]
            for r in profile.dataset_card(docs, approx=True).collect()}
    assert card[("corpus", "n_docs")] == docs.count()
    assert card[("corpus", "distinct_langs")] >= 1.0
    assert ("length", "p50_chars") in card


def test_dataset_card_frees_per_doc_cache(spark, monkeypatch):
    """dataset_card must unpersist its corpus-sized per-doc cache after
    materializing the (bounded) card — the r11 advice item: no N-row
    cached frame may outlive the call."""
    from orientdb_spark.pipeline import profile

    captured = {}
    orig = profile._dataset_card_plan

    def spy(*a, **k):
        card = orig(*a, **k)
        captured["per_doc"] = card._ods_per_doc
        return card

    monkeypatch.setattr(profile, "_dataset_card_plan", spy)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    card = profile.dataset_card(docs)
    assert card.count() > 0
    lvl = captured["per_doc"].storageLevel
    assert not (lvl.useMemory or lvl.useDisk), "per-doc cache leaked"


def test_benford_audit_known_distribution(spark):
    """An exactly-Benford column (first digits planted by count) shows
    zero-ish deviation; a constant-leading-digit column deviates at
    the 1-digit row by 1 - log10(2); zeros/nulls are excluded."""
    import math

    from orientdb_spark.pipeline.profile import benford_audit

    rows = []
    # plant first digits with frequencies proportional to log10(1+1/d)
    for d in range(1, 10):
        n = round(math.log10(1 + 1 / d) * 1000)
        rows += [(float(f"{d}23.45"),)] * n
    df = spark.createDataFrame(rows, "value double")
    got = {r["digit"]: r.asDict() for r in benford_audit(df).collect()}
    assert set(got) == set(range(1, 10))
    assert all(r["deviation"] < 0.001 for r in got.values())
    # scale-invariance of the digit extraction: x1000 changes nothing
    scaled = benford_audit(df.select((F.col("value") * 1000.0).alias("value")))
    got2 = {r["digit"]: r.asDict() for r in scaled.collect()}
    assert {d: r["n"] for d, r in got.items()} == {
        d: r["n"] for d, r in got2.items()
    }
    # constant-digit data: observed 1.0 at digit 7, deviation 1 - exp(7)
    bad = spark.createDataFrame(
        [(7.77,), (700.0,), (0.0071,), (0.0,), (None,)], "value double"
    )
    gb = {r["digit"]: r.asDict() for r in benford_audit(bad).collect()}
    assert set(gb) == {7} and gb[7]["n"] == 3  # 0.0 and NULL excluded
    assert gb[7]["observed_frac"] == 1.0
    assert gb[7]["deviation"] == round(1.0 - math.log10(1 + 1 / 7) + 1e-12, 6)


def test_distribution_drift_identical_sides_zero_drift(spark):
    """Identical ref/cur distributions: fracs agree bin-by-bin,
    abs_diff and chi2_contrib are 0 everywhere."""
    from orientdb_spark.pipeline.profile import distribution_drift

    df = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    rows = distribution_drift(df, df, "v", n_bins=5).collect()
    assert len(rows) == 5
    assert sum(r["ref_n"] for r in rows) == 100
    for r in rows:
        assert r["ref_frac"] == r["cur_frac"]
        assert r["abs_diff"] == 0.0
        assert r["chi2_contrib"] == 0.0


def test_distribution_drift_hand_checked(spark):
    """Explicit bounds, a clamped out-of-range current value, a
    ref-empty bin (chi2 NULL), and hand-computed chi2 on a moved bin."""
    from orientdb_spark.pipeline.profile import distribution_drift

    ref = spark.createDataFrame([(0.5,), (0.5,), (1.5,), (None,)], "v double")
    cur = spark.createDataFrame([(0.5,), (2.5,), (9.9,)], "v double")
    rows = {
        r["bin"]: r.asDict()
        for r in distribution_drift(
            ref, cur, "v", n_bins=4, lo=0.0, hi=4.0
        ).collect()
    }
    # ref: bins {0: 2, 1: 1}; cur: {0: 1, 2: 1, 3: 1 (9.9 clamped)}
    assert rows[0]["ref_n"] == 2 and rows[0]["cur_n"] == 1
    assert rows[3]["cur_n"] == 1  # out-of-range clamps, not drops
    assert rows[2]["chi2_contrib"] is None  # no reference mass
    assert rows[1]["cur_n"] == 0 and rows[1]["cur_frac"] == 0.0
    # bin 0: e = round(2/3) * 3 = 2.000001; chi2 = (1-e)^2/e
    e = round(2 / 3 + 1e-12, 6) * 3
    assert rows[0]["chi2_contrib"] == round((1 - e) ** 2 / e + 1e-12, 6)
    assert rows[0]["lo_edge"] == 0.0 and rows[0]["hi_edge"] == 1.0
    import pytest

    with pytest.raises(ValueError, match="need n_bins"):
        distribution_drift(ref, cur, "v", n_bins=1)
    with pytest.raises(ValueError, match="both lo and hi"):
        distribution_drift(ref, cur, "v", lo=0.0)
