"""Corpus sampling / split / canonicalization operators
(orientdb_spark/pipeline/sampling.py) vs the DuckDB oracle and their own
invariants."""

import pytest
from pyspark.sql import functions as F

from orientdb_spark.pipeline import dedup, sampling
from tests.conftest import SF_DIR, assert_matches_oracle

H60 = "(('0x' || substring(md5({s}), 1, 15))::UBIGINT::BIGINT)"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_assign_split_matches_oracle(spark, oracle):
    out = sampling.assign_split(_docs(spark)).select("doc_id", "split")
    b = H60.format(s="'42:' || doc_id") + " % 10000"
    assert_matches_oracle(
        out,
        oracle,
        f"SELECT doc_id, CASE WHEN {b} < 9800 THEN 'train' "
        f"WHEN {b} < 9900 THEN 'valid' ELSE 'test' END AS split FROM documents",
    )


def test_assign_split_ratios_and_stability(spark):
    docs = _docs(spark)
    out = sampling.assign_split(docs, {"train": 0.8, "test": 0.2})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert 0.7 * n < counts["train"] < 0.9 * n
    # assignment is a pure function of (seed, id): a doc keeps its split
    # when computed over any subset of the corpus
    sub = sampling.assign_split(docs.filter(F.col("doc_id") % 3 == 0), {"train": 0.8, "test": 0.2})
    full = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    for r in sub.select("doc_id", "split").collect():
        assert full[r["doc_id"]] == r["split"]


def test_quota_sample_invariants(spark):
    docs = _docs(spark)
    out = sampling.quota_sample(docs, ["source"], quota=7)
    per = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 7 for r in per)
    # groups smaller than the quota keep everything
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {r["source"]: r["n"] for r in per}
    for src, n in sizes.items():
        assert kept[src] == min(n, 7)


def test_quota_sample_prefilter_identical(spark):
    """The count-based hash prefilter must not change the sample when the
    surviving set covers the quota (overshoot 3 on ~50-row groups)."""
    docs = _docs(spark)
    plain = sampling.quota_sample(docs, ["source"], quota=5).select("doc_id", "sample_rank")
    pre = sampling.quota_sample(
        docs, ["source"], quota=5, prefilter_overshoot=3.0
    ).select("doc_id", "sample_rank")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pre.collect()))


def test_quota_sample_matches_oracle(spark, oracle):
    out = sampling.quota_sample(_docs(spark), ["source"], quota=7).select(
        "doc_id", "source", "sample_rank"
    )
    b = H60.format(s="'42:' || doc_id") + " % 1000000"
    assert_matches_oracle(
        out,
        oracle,
        f"SELECT doc_id, source, row_number() OVER "
        f"(PARTITION BY source ORDER BY {b}, doc_id) AS sample_rank "
        f"FROM documents QUALIFY sample_rank <= 7",
    )


def test_duplicate_clusters_and_canonicalize(spark):
    # hand-built pair set: {1,2,3} chained (transitive), {7,8}, 9 alone
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
    )
    clusters = sampling.duplicate_clusters(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}

    corpus = spark.createDataFrame(
        [(i, f"doc {i}", (100 if i == 2 else 10 + i)) for i in (1, 2, 3, 7, 8, 9)],
        ["doc_id", "text", "n_chars"],
    )
    out = sampling.canonicalize(corpus, clusters)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 2 has the highest quality in {1,2,3} -> survivor
    assert rows[2]["keep"] and rows[2]["canonical_id"] == 2
    assert not rows[1]["keep"] and rows[1]["canonical_id"] == 2
    assert not rows[3]["keep"] and rows[3]["canonical_id"] == 2
    # {7,8}: 8 has n_chars 18 > 17 -> survivor
    assert rows[8]["keep"] and rows[7]["canonical_id"] == 8
    # unclustered doc is its own canonical
    assert rows[9]["keep"] and rows[9]["canonical_id"] == 9 and rows[9]["cluster_id"] == 9


def test_canonicalize_from_lsh_pairs(spark):
    """End-to-end: LSH pair detection -> clusters -> survivors. Every
    cluster elects exactly one survivor; redirects point at it."""
    docs = _docs(spark)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9)
    clusters = sampling.duplicate_clusters(pairs)
    out = sampling.canonicalize(docs, clusters, quality_col="n_chars")
    agg = (
        out.groupBy("cluster_id")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("canonical_id").alias("n_canon"),
        )
        .collect()
    )
    assert len(agg) > 0
    for r in agg:
        assert r["n_keep"] == 1 and r["n_canon"] == 1
    # survivors' count equals number of clusters; corpus is fully covered
    assert out.count() == docs.count()


def test_pack_sequences_matches_reference_and_partition_invariant(spark):
    from orientdb_spark.pipeline import sampling

    rows = [(i, (i * 37) % 90 + (1 if i % 13 else 0)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    acc, ref = 0, {}
    for i, t in rows:
        ref[i] = (
            acc // 64,
            acc % 64,
            1 if t == 0 else (acc + t - 1) // 64 - acc // 64 + 1,
        )
        acc += t
    for parts in (2, 7):
        got = {
            r["doc_id"]: (r["seq_index"], r["seq_offset"], r["n_seqs_spanned"])
            for r in sampling.pack_sequences(df, budget=64, partitions=parts).collect()
        }
        assert got == ref, parts  # exact + independent of partition count
    # packing density: the stream has no holes — each doc starts exactly
    # where the previous one ended (mod budget)
    pos = 0
    for i, t in rows:
        assert ref[i][1] == pos % 64
        pos += t


def test_sample_mixture_composition(spark):
    """Integer floor quotas, undersized sources contribute everything,
    unlisted sources are excluded, and the draw is deterministic."""
    from orientdb_spark.pipeline.sampling import sample_mixture

    rows = [(i, f"s{i % 3}") for i in range(30)]  # s0/s1/s2 x10 each
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = sample_mixture(df, weights={"s0": 60, "s1": 40}, total=10)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src == {"s0": 6, "s1": 4}  # 10*60//100, 10*40//100
    # small source: quota larger than the source -> whole source
    tiny = sample_mixture(df, weights={"s0": 100}, total=50)
    assert tiny.count() == 10
    # deterministic
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in sample_mixture(df, weights={"s0": 60, "s1": 40}, total=10).collect()}
    assert a == b


def test_sample_mixture_validates(spark):
    from orientdb_spark.pipeline.sampling import sample_mixture

    df = spark.createDataFrame([(1, "s0")], "doc_id bigint, source string")
    with pytest.raises(ValueError):
        sample_mixture(df, weights={}, total=10)
    with pytest.raises(ValueError):
        sample_mixture(df, weights={"s0": -1}, total=10)
    with pytest.raises(ValueError):
        sample_mixture(df, weights={"s0": 1}, total=-5)


def test_sample_mixture_property(spark):
    """Property: per-source output equals min(floor quota, source size)
    for random weights/totals, and the draw is a subset of the corpus."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from orientdb_spark.pipeline.sampling import sample_mixture

    rows = [(i, f"s{i % 4}") for i in range(40)]  # 4 sources x 10
    df = spark.createDataFrame(rows, "doc_id bigint, source string")

    @settings(
        max_examples=15,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        w=st.tuples(*(st.integers(min_value=0, max_value=9) for _ in range(3))),
        total=st.integers(min_value=0, max_value=60),
    )
    def run(w, total):
        weights = {f"s{i}": wi for i, wi in enumerate(w)}
        if sum(weights.values()) == 0:
            return
        out = sample_mixture(df, weights=weights, total=total)
        got = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        wsum = sum(weights.values())
        for s, wi in weights.items():
            quota = total * wi // wsum
            assert got.get(s, 0) == min(quota, 10), (s, weights, total, got)
        assert "s3" not in got  # unlisted source excluded

    run()


def test_contrastive_negatives_deterministic_and_self_free(spark):
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.sampling import contrastive_negatives

    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, contrastive_negatives(docs, k=3, n_buckets=8).collect()))
    # input order must not matter: reversed input, same draws
    rev = docs.orderBy(F.col("doc_id").desc())
    b = sorted(map(tuple, contrastive_negatives(rev, k=3, n_buckets=8).collect()))
    assert a == b and len(a) > 0
    assert all(d != p for d, _, p in a), "self-pair leaked"
    # k slots per doc (buckets of 100/8 docs: every probe finds a partner)
    per_doc: dict = {}
    for d, s, _ in a:
        per_doc.setdefault(d, set()).add(s)
    assert all(slots == {0, 1, 2} for slots in per_doc.values())
    # different seeds draw different partner sets
    c = sorted(
        map(tuple, contrastive_negatives(docs, k=3, n_buckets=8, seed=7).collect())
    )
    assert c != a


def test_contrastive_negatives_partner_spread(spark):
    """The draws must not collapse onto a handful of partners (the
    bucket argmin could degenerate if the score ignored the slot)."""
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.sampling import contrastive_negatives

    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    got = contrastive_negatives(docs, k=4, n_buckets=16).collect()
    partners = {r["partner_id"] for r in got}
    assert len(partners) > 100, f"only {len(partners)} distinct partners"


def test_weighted_sample_favors_heavy_rows(spark):
    """A-ES correctness signal: across seeds, a 50x-heavier row must be
    selected far more often than a light one."""
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.sampling import weighted_sample

    rows = [(0, 50.0)] + [(i, 1.0) for i in range(1, 40)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    heavy_hits = light_hits = 0
    for seed in range(20):
        got = {r["doc_id"] for r in
               weighted_sample(df, "w", k=5, seed=seed).collect()}
        assert len(got) == 5
        heavy_hits += 0 in got
        light_hits += 1 in got
    assert heavy_hits >= 15, heavy_hits  # P(select) ~ 1 for the heavy row
    assert light_hits <= 10, light_hits


def test_weighted_sample_deterministic_and_filters_nonpositive(spark):
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.sampling import weighted_sample

    rows = [(i, float(i % 7) - 1.0) for i in range(30)]  # some w <= 0
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = sorted(r["doc_id"] for r in weighted_sample(df, "w", k=8).collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(df.orderBy(F.desc("doc_id")), "w", k=8).collect()
    )
    assert a == b and len(a) == 8
    bad = {i for i, w in rows if w <= 0}
    assert not (set(a) & bad), "non-positive weight sampled"


def test_stratified_split_exact_floors(spark):
    """Per stratum: earlier-listed splits get exact integer floors of
    the stratum size, the last absorbs the remainder — even for a rare
    3-row stratum where a hash-bucket carve could starve eval."""
    from orientdb_spark.pipeline.sampling import stratified_split

    rows = [(f"a{i}", "big") for i in range(100)] + [
        (f"b{i}", "rare") for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "label"])
    out = stratified_split(df, strata=["label"]).collect()
    counts = {}
    for r in out:
        counts.setdefault(r["label"], {}).setdefault(r["split"], 0)
        counts[r["label"]][r["split"]] += 1
    assert counts["big"] == {"train": 80, "valid": 10, "test": 10}
    # n=3: train floor(2.4)=2, valid floor(2.7)-2=0, test remainder 1
    assert counts["rare"] == {"train": 2, "test": 1}


def test_stratified_split_deterministic_and_stable(spark):
    """Same (seed, id) -> same split regardless of extra rows in other
    strata; changing the seed reshuffles."""
    from orientdb_spark.pipeline.sampling import stratified_split

    base = spark.createDataFrame(
        [(f"d{i}", "x") for i in range(50)], ["doc_id", "label"]
    )
    more = base.unionAll(
        spark.createDataFrame([(f"e{i}", "y") for i in range(20)], ["doc_id", "label"])
    )
    a = {r["doc_id"]: r["split"] for r in stratified_split(base, ["label"]).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in stratified_split(more, ["label"]).collect()
        if r["label"] == "x"
    }
    assert a == b
    s2 = {
        r["doc_id"]: r["split"]
        for r in stratified_split(base, ["label"], seed=7).collect()
    }
    assert s2 != a  # 50 rows: P[identical under reseed] ~ 0


def test_stratified_split_validates_ratios(spark):
    from orientdb_spark.pipeline.sampling import stratified_split

    df = spark.createDataFrame([("a", "x")], ["doc_id", "label"])
    import pytest

    with pytest.raises(ValueError):
        stratified_split(df, ["label"], ratios={"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError):
        stratified_split(df, ["label"], ratios={"train": 1.0, "test": 0.0})


# ---- DSIR importance resampling (Xie et al. 2023) ----


def test_dsir_weights_exact_tiny_corpus(spark):
    """Hand-computed replay of the weight formula on a 3-doc corpus:
    grams are lower-cased unigrams + bigrams, b = h60(gram) % buckets,
    weight = sum over gram occurrences of ln p_t(b) - ln p_s(b) with
    add-1 smoothing — computed independently in pure Python (hashlib
    md5, math.log) and compared at the 6-dp round."""
    import hashlib
    import math

    src_rows = [(1, "apple banana"), (2, "car door"), (3, "apple apple")]
    tgt_rows = [(10, "apple banana apple")]
    B, s = 97, 1.0

    def grams(text):
        t = text.lower().split()
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    tgt_grams = [h(g) for r in tgt_rows for g in grams(r[1])]
    src_grams = [h(g) for r in src_rows for g in grams(r[1])]
    nt, ns = len(tgt_grams), len(src_grams)

    def lr(b):
        pt = (tgt_grams.count(b) + s) / (nt + s * B)
        ps = (src_grams.count(b) + s) / (ns + s * B)
        return math.log(pt) - math.log(ps)

    expected = {
        r[0]: round(sum(lr(h(g)) for g in grams(r[1])) + 1e-12, 6)
        for r in src_rows
    }
    src = spark.createDataFrame(src_rows, ["doc_id", "text"])
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["weight"]
        for r in sampling.dsir_importance_weights(src, tgt, buckets=B).collect()
    }
    assert set(got) == set(expected)
    for d in expected:
        assert abs(got[d] - expected[d]) < 2e-6, (d, got[d], expected[d])
    # the doc sharing the target's vocabulary scores highest
    assert max(got, key=got.get) in (1, 3)


def test_dsir_resample_selects_target_like_docs(spark):
    """Two disjoint-vocabulary populations; target drawn from one of
    them — the top-k resample must come (almost) entirely from the
    target-like population, and ranks are well-formed 1..k."""
    import random

    rng = random.Random(3)
    rows = []
    for i in range(100):
        words = [f"eng{rng.randrange(50)}" for _ in range(30)]
        rows.append((i, " ".join(words), "A"))
    for i in range(100, 200):
        words = [f"ger{rng.randrange(50)}" for _ in range(30)]
        rows.append((i, " ".join(words), "B"))
    src = spark.createDataFrame(rows, ["doc_id", "text", "pop"])
    tgt = src.filter(F.col("pop") == "A").limit(30).select("doc_id", "text")
    sel = sampling.dsir_resample(src, tgt, k=40).collect()
    assert sorted(r["rank"] for r in sel) == list(range(1, 41))
    frac_a = sum(1 for r in sel if r["doc_id"] < 100) / len(sel)
    assert frac_a >= 0.95, frac_a
    # gumbel mode: deterministic across calls, still target-skewed
    g1 = {r["doc_id"] for r in sampling.dsir_resample(src, tgt, k=40, mode="gumbel").collect()}
    g2 = {r["doc_id"] for r in sampling.dsir_resample(src, tgt, k=40, mode="gumbel").collect()}
    assert g1 == g2
    assert sum(1 for d in g1 if d < 100) / len(g1) >= 0.8


def test_dsir_validation(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="buckets"):
        sampling.dsir_importance_weights(df, df, buckets=0)
    with pytest.raises(ValueError, match="mode"):
        sampling.dsir_resample(df, df, k=1, mode="uniform")
    with pytest.raises(ValueError, match="k >= 1"):
        sampling.dsir_resample(df, df, k=0)


def test_token_budget_select_matches_global_window(spark):
    """The distributed prefix-sum form must equal the naive global
    window exactly (values included), stay partition-count invariant,
    and respect the maximal-prefix rule at the boundary."""
    import random

    from pyspark.sql import Window

    rng = random.Random(4)
    rows = [(i, rng.randrange(1, 100), rng.randrange(5, 50)) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "quality", "n_tokens"]).repartition(11)
    got = sorted(map(tuple, sampling.token_budget_select(df, budget=2500).collect()))
    w = Window.orderBy(F.col("quality").desc(), F.col("doc_id"))
    ref = (
        df.withColumn("budget_rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "tokens_before",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
        .filter(F.col("tokens_before") + F.col("n_tokens") <= 2500)
        .select(
            "doc_id", "quality",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "budget_rank", "tokens_before",
        )
    )
    assert got == sorted(map(tuple, ref.collect())) and 0 < len(got) < 400
    got2 = sorted(
        map(
            tuple,
            sampling.token_budget_select(
                df.repartition(3), budget=2500, partitions=5
            ).collect(),
        )
    )
    assert got2 == got
    # maximal prefix: ranks are contiguous 1..k and the NEXT doc would
    # not have fit
    ranks = sorted(r[3] for r in got)
    assert ranks == list(range(1, len(got) + 1))
    used = max(r[4] + r[2] for r in got)
    assert used <= 2500
    # zero budget keeps nothing; negative rejected
    assert sampling.token_budget_select(df, budget=0).count() == 0
    with pytest.raises(ValueError, match="budget"):
        sampling.token_budget_select(df, budget=-1)


def test_token_budget_select_plan_no_global_window(spark):
    """The scale contract: no partition-less window anywhere — the
    running sum rides per-partition windows over range-partitioned
    data."""
    df = spark.createDataFrame(
        [(i, i % 7, 10) for i in range(50)], ["doc_id", "quality", "n_tokens"]
    )
    out = sampling.token_budget_select(df, budget=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "__pid" in m.group(1), plan


def test_epoch_shard_order_is_permutation_per_epoch(spark):
    """Each epoch's (shard, pos) assignment is a permutation of the
    corpus: every doc appears exactly once per epoch, positions within a
    shard are 0..count-1 with no gaps, and different epochs produce
    different orders while the same call reproduces bit-identically."""
    from orientdb_spark.pipeline.sampling import epoch_shard_order

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    out = epoch_shard_order(docs, n_epochs=2, n_shards=8).collect()
    assert len(out) == 2 * n
    for e in (0, 1):
        rows = [r for r in out if r.epoch == e]
        assert len({r.doc_id for r in rows}) == n
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r.pos)
        assert set(by_shard) <= set(range(8))
        for poss in by_shard.values():
            assert sorted(poss) == list(range(len(poss)))
    order0 = sorted((r.shard, r.pos, r.doc_id) for r in out if r.epoch == 0)
    order1 = sorted((r.shard, r.pos, r.doc_id) for r in out if r.epoch == 1)
    assert order0 != order1  # epochs re-shuffle
    again = epoch_shard_order(docs, n_epochs=2, n_shards=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # a different seed is a different permutation
    other = epoch_shard_order(docs, n_epochs=1, n_shards=8, seed=7).collect()
    assert sorted((r.shard, r.pos, r.doc_id) for r in other) != order0


def test_epoch_shard_order_validates(spark):
    from orientdb_spark.pipeline.sampling import epoch_shard_order

    docs = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError, match="n_epochs"):
        epoch_shard_order(docs, n_epochs=0)
    with pytest.raises(ValueError, match="n_shards"):
        epoch_shard_order(docs, n_shards=0)


def test_leakage_safe_split_coassigns_clusters(spark):
    """Every member of a duplicate cluster must land in the SAME split,
    keyed by the cluster's min member id; unpaired docs match plain
    assign_split exactly."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id LONG, text STRING"
    )
    pairs = spark.createDataFrame(
        [(0, 150), (150, 199), (7, 8)], "id_a LONG, id_b LONG"
    )
    out = sampling.leakage_safe_split(
        docs, pairs, ratios={"train": 0.5, "valid": 0.25, "test": 0.25}
    )
    got = {r["doc_id"]: (r["cluster_key"], r["split"]) for r in out.collect()}
    # chain 0-150-199 is one component keyed at 0; pair (7,8) keyed at 7
    assert got[0] == got[150] == got[199]
    assert got[0][0] == 0
    assert got[7] == got[8]
    assert got[7][0] == 7
    # unpaired docs: own key, and the SAME split plain assign_split gives
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_split(
            docs, ratios={"train": 0.5, "valid": 0.25, "test": 0.25}
        ).collect()
    }
    for i in range(200):
        if i in (0, 150, 199, 7, 8):
            continue
        assert got[i] == (i, plain[i])


def test_leakage_safe_split_stable_under_cluster_growth(spark):
    """A new doc joining an existing cluster adopts the cluster's split;
    prior members keep theirs (the min member id stands)."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id LONG, text STRING"
    )
    before = {
        r["doc_id"]: r["split"]
        for r in sampling.leakage_safe_split(
            docs, spark.createDataFrame([(3, 9)], "id_a LONG, id_b LONG")
        ).collect()
    }
    grown = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(51)], "doc_id LONG, text STRING"
    )
    after = {
        r["doc_id"]: r["split"]
        for r in sampling.leakage_safe_split(
            grown,
            spark.createDataFrame([(3, 9), (9, 50)], "id_a LONG, id_b LONG"),
        ).collect()
    }
    assert after[50] == after[3] == after[9] == before[3]
    for i in range(50):
        assert after[i] == before[i]


# --- domain reweighting (DoReMi shape, Xie et al. 2023) ----------------------


def test_domain_reweight_upweights_hard_domain(spark):
    """The domain whose text is atypical of the corpus LM (higher mean
    bigram NLL) must end above uniform weight, the easy domain below;
    weights stay a distribution (sum ~ 1 before smoothing re-mixes)."""
    from orientdb_spark.pipeline import sampling

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, common, "easy") for i in range(30)]
    rows += [(100 + i, f"zx{i} qq{i * 7} vv{i * 13} kk{i * 3} jj{i + 5} ww{i}",
              "hard") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r for r in sampling.domain_reweight(df).collect()}
    assert out["hard"]["mean_nll"] > out["easy"]["mean_nll"]
    assert out["hard"]["excess_nll"] > 0 and out["easy"]["excess_nll"] == 0
    assert out["hard"]["weight"] > 0.5 > out["easy"]["weight"]
    total = out["hard"]["weight"] + out["easy"]["weight"]
    assert abs(total - 1.0) < 1e-4


def test_domain_reweight_partition_invariance(spark):
    from orientdb_spark.pipeline import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, sampling.domain_reweight(docs).collect()))
    b = sorted(map(tuple, sampling.domain_reweight(docs.repartition(17)).collect()))
    assert a == b and len(a) == 20


def test_domain_reweight_validation(spark):
    from orientdb_spark.pipeline import sampling

    docs = spark.createDataFrame([(1, "a b", "s")], ["doc_id", "text", "source"])
    with pytest.raises(ValueError, match="iters"):
        sampling.domain_reweight(docs, iters=0)
    with pytest.raises(ValueError, match="smoothing"):
        sampling.domain_reweight(docs, smoothing=1.5)


def test_curriculum_stages_order_by_difficulty(spark):
    """Stage cuts are NLL quantiles: every stage-0 doc is no harder
    than every stage-2 doc, stages partition the corpus, and positions
    are a 0-based dense sequence within each (stage, shard)."""
    from orientdb_spark.pipeline import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = sampling.curriculum_order(docs, n_stages=3, n_shards=4).collect()
    assert len(out) == docs.count()
    by_stage = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r)
    assert set(by_stage) == {0, 1, 2}
    assert max(r["nll"] for r in by_stage[0]) <= min(r["nll"] for r in by_stage[2])
    from collections import defaultdict
    groups = defaultdict(list)
    for r in out:
        groups[(r["stage"], r["shard"])].append(r["pos"])
    for poss in groups.values():
        assert sorted(poss) == list(range(len(poss)))


def test_curriculum_partition_invariance_and_validation(spark):
    import pytest

    from orientdb_spark.pipeline import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, sampling.curriculum_order(docs).collect()))
    b = sorted(map(tuple, sampling.curriculum_order(docs.repartition(11)).collect()))
    assert a == b
    with pytest.raises(ValueError, match="n_stages"):
        sampling.curriculum_order(docs, n_stages=1)
    with pytest.raises(ValueError, match="n_shards"):
        sampling.curriculum_order(docs, n_shards=0)


def test_curriculum_order_approx_removes_exact_percentile(spark):
    """approx=True must swap the single-reducer exact F.percentile for
    the mergeable percentile_approx sketch in the stage-cut aggregate
    (the profile_columns approx precedent, r11 verdict item 4)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    strip = lambda p: p.replace("percentile_approx(", "")  # noqa: E731
    exact = sampling.curriculum_order(docs, n_stages=3, n_shards=4)
    approx = sampling.curriculum_order(docs, n_stages=3, n_shards=4, approx=True)
    p_exact = exact._jdf.queryExecution().optimizedPlan().toString()
    p_approx = approx._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile(" in strip(p_exact)
    assert "percentile(" not in strip(p_approx)
    assert "percentile_approx(" in p_approx
    # every doc still staged and sharded, stages within range
    out = approx.collect()
    assert len(out) == docs.count()
    assert {r["stage"] for r in out} <= {0, 1, 2}


# --- temperature-scaled mixture (XLM / mT5 n^alpha balancing) ----------------


def test_temperature_mixture_quotas_sum_and_upsample_tail(spark):
    """alpha=0.5 quotas follow sqrt(n) shares via largest-remainder
    apportionment: they sum to total (when every group is big enough),
    and the tail group's share EXCEEDS its raw proportion."""
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.temperature_mixture(df, total=100, alpha=0.5).collect()
    quotas = {}
    for r in out:
        quotas[r["lang"]] = r["quota"]
    assert sum(quotas.values()) == 100
    # raw share of 'small' is 10%; sqrt share = sqrt(100)/(sqrt(900)+sqrt(100)) = 25%
    assert quotas["small"] == 25 and quotas["big"] == 75
    # selection fills each quota exactly (groups are big enough)
    from collections import Counter
    got = Counter(r["lang"] for r in out)
    assert got == {"big": 75, "small": 25}


def test_temperature_mixture_deterministic_and_validates(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted((r["doc_id"], r["sample_rank"]) for r in
               sampling.temperature_mixture(docs, total=200).collect())
    b = sorted((r["doc_id"], r["sample_rank"]) for r in
               sampling.temperature_mixture(docs.repartition(13), total=200).collect())
    assert a == b and len(a) == 200
    with pytest.raises(ValueError, match="total"):
        sampling.temperature_mixture(docs, total=-1)
    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_mixture(docs, total=10, alpha=0.0)


def test_temperature_mixture_nonsqrt_alpha_matches_numpy(spark):
    """The production (non-oracle) alpha path: quotas at alpha in
    {0.3, 0.7} must match a pure-numpy replay of the same arithmetic
    (pow -> normalize -> 6-dp nudge grid -> floor + Hamilton
    largest-remainder, remainder ties by group value). The docstring
    flags libm pow as not cross-ENGINE parity-safe; this pins that the
    Spark JVM's pow and numpy's agree on the quota grid for real group
    sizes, so the production path has evidence too (r12 verdict 8)."""
    import numpy as np

    sizes = {"en": 91234, "fr": 7341, "de": 1297, "sw": 128, "yo": 13}
    rows = []
    i = 0
    for g, n in sizes.items():
        rows += [(i + j, g) for j in range(n)]
        i += n
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    for alpha, total in ((0.3, 1000), (0.7, 777)):
        out = sampling.temperature_mixture(df, total=total, alpha=alpha)
        got = {r["lang"]: r["quota"]
               for r in out.select("lang", "quota").distinct().collect()}
        # numpy replay of the exact quota arithmetic
        groups = sorted(sizes)
        w = np.power(np.array([float(sizes[g]) for g in groups]), alpha)
        raw = np.round(w / w.sum() * total + 1e-12, 6)
        floors = np.floor(raw).astype(int)
        rem = raw - floors
        leftover = total - floors.sum()
        order = sorted(range(len(groups)), key=lambda j: (-rem[j], groups[j]))
        expect = dict(zip(groups, floors))
        for j in order[:leftover]:
            expect[groups[j]] += 1
        # a zero-quota group contributes no rows, so it is absent from
        # the returned frame — compare the positive-quota support
        assert got == {g: q for g, q in expect.items() if q > 0}, (
            alpha, got, expect,
        )
        assert sum(expect.values()) == total


def test_temperature_mixture_small_group_contributes_all(spark):
    rows = [(i, "a") for i in range(50)] + [(100 + i, "b") for i in range(2)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = sampling.temperature_mixture(df, total=40, alpha=0.5).collect()
    from collections import Counter
    got = Counter(r["lang"] for r in out)
    # b's quota exceeds its 2 rows -> contributes both, no redistribution
    assert got["b"] == 2 and got["a"] <= 40


# --- unimax_sample ---------------------------------------------------------


def _unimax_ref(counts, total, epoch_cap):
    """Pure-python waterfill replay of unimax_sample's quota math."""
    import math

    caps = {g: round(n * epoch_cap + 1e-12, 6) for g, n in counts.items()}
    order = sorted(caps, key=lambda g: (caps[g], g))
    s = len(order)
    capped, pre = [], 0.0
    for j, g in enumerate(order, 1):
        if caps[g] * (s - j + 1) + round(pre + 1e-12, 6) < total:
            capped.append(g)
        pre += caps[g]
    csum = round(sum(caps[g] for g in capped) + 1e-12, 6)
    nun = s - len(capped)
    share = round((total - csum) / nun + 1e-12, 6) if nun else 0.0
    alloc = {g: caps[g] if g in capped else share for g in order}
    t = min(total, math.floor(round(sum(alloc.values()) + 1e-12, 6)))
    floors = {g: math.floor(alloc[g]) for g in order}
    leftover = t - sum(floors.values())
    quota = dict(floors)
    for g in sorted(order, key=lambda g: (-(alloc[g] - floors[g]), g))[:leftover]:
        quota[g] += 1
    return quota, set(capped)


def _unimax_run(spark, counts, total, epoch_cap):
    rows = [(f"{g}:{i}", g) for g, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id string, lang string")
    out = sampling.unimax_sample(df, total=total, epoch_cap=epoch_cap).collect()
    quota, capped, picked = {}, set(), {}
    for r in out:
        quota[r["lang"]] = r["quota"]
        if r["capped"]:
            capped.add(r["lang"])
        picked[r["lang"]] = picked.get(r["lang"], 0) + 1
    return quota, capped, picked


def test_unimax_middle_split_caps_tail_waterfills_head(spark):
    counts = {"de": 71, "zh": 74, "es": 80, "fr": 82, "en": 193}
    quota, capped, picked = _unimax_run(spark, counts, 200, 0.5)
    # tails cap at n*0.5; en takes the entire freed remainder
    assert capped == {"de", "zh", "es", "fr"}
    rq, rc = _unimax_ref(counts, 200, 0.5)
    assert {g: q for g, q in rq.items() if q} == quota
    assert sum(quota.values()) == 200
    # every quota is satisfiable here, so the sample fills it exactly
    assert picked == {g: q for g, q in quota.items() if q}


def test_unimax_no_caps_is_uniform(spark):
    counts = {"de": 71, "zh": 74, "es": 80, "fr": 82, "en": 193}
    quota, capped, _ = _unimax_run(spark, counts, 300, 2.0)
    assert capped == set()
    assert quota == {g: 60 for g in counts}


def test_unimax_budget_exceeds_corpus_all_capped(spark):
    counts = {"a": 10, "b": 30}
    quota, capped, picked = _unimax_run(spark, counts, 1000, 1.0)
    assert capped == {"a", "b"}
    assert quota == {"a": 10, "b": 30}  # epoch_cap=1 -> cap = group size
    assert picked == quota


def test_unimax_matches_reference_on_fuzzed_mixes(spark):
    import random

    rng = random.Random(1306)
    for _ in range(4):
        counts = {
            f"g{i}": rng.randint(1, 120) for i in range(rng.randint(2, 9))
        }
        total = rng.randint(1, 2 * sum(counts.values()))
        cap = rng.choice([0.25, 0.5, 1.0, 1.5, 3.0])
        quota, capped, picked = _unimax_run(spark, counts, total, cap)
        rq, rc = _unimax_ref(counts, total, cap)
        exp_quota = {g: q for g, q in rq.items() if min(q, counts[g]) > 0}
        assert quota == exp_quota, (counts, total, cap)
        assert capped == {g for g in rc if g in exp_quota}, (counts, total, cap)
        assert picked == {
            g: min(q, counts[g]) for g, q in rq.items() if min(q, counts[g]) > 0
        }, (counts, total, cap)


def test_unimax_deterministic_and_validates(spark):
    docs = _docs(spark)
    a = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in sampling.unimax_sample(docs, total=200, epoch_cap=0.5).collect()
    )
    b = sorted(
        (r["doc_id"], r["sample_rank"])
        for r in sampling.unimax_sample(
            docs.repartition(13), total=200, epoch_cap=0.5
        ).collect()
    )
    assert a == b and len(a) == 200
    with pytest.raises(ValueError, match="total"):
        sampling.unimax_sample(docs, total=-1)
    with pytest.raises(ValueError, match="epoch_cap"):
        sampling.unimax_sample(docs, total=10, epoch_cap=0.0)


def test_epochs_report_cap_accounting(spark):
    """Hand-checked waterline: a group whose allocation exceeds
    max_epochs x its tokens flags over_cap and reports the excess;
    uniform weights split the budget evenly; validation raises."""
    import pytest

    from orientdb_spark.pipeline import sampling

    rows = [("big", "w " * 100), ("big", "w " * 100), ("small", "w " * 10)]
    df = spark.createDataFrame(
        [(i, t.strip(), g) for i, (g, t) in enumerate(rows)],
        "doc_id bigint, text string, lang string",
    )
    # big: 200 tokens, small: 10. budget 420, weights 0.5/0.5 ->
    # alloc 210 each; small cap = 4*10 = 40 -> over_cap, excess 170.
    got = {
        r["lang"]: r.asDict()
        for r in sampling.epochs_report(
            df, weights={"big": 0.5, "small": 0.5}, budget_tokens=420
        ).collect()
    }
    assert got["big"]["alloc_tokens"] == 210 and got["big"]["over_cap"] is False
    assert got["big"]["epochs"] == 1.05
    assert got["small"]["alloc_tokens"] == 210
    assert got["small"]["over_cap"] is True
    assert got["small"]["effective_tokens"] == 40
    assert got["small"]["excess_tokens"] == 170
    assert got["small"]["capped_epochs"] == 4.0
    # uniform default: each group gets budget / n_groups
    uni = {
        r["lang"]: r.asDict()
        for r in sampling.epochs_report(df, budget_tokens=420).collect()
    }
    assert uni["big"]["alloc_tokens"] == 210 and uni["big"]["weight"] == 0.5
    # corpus-relative budget: 2 passes of 210 tokens, weight all on big
    rel = {
        r["lang"]: r.asDict()
        for r in sampling.epochs_report(
            df, weights={"big": 1.0}, budget_epochs=2.0
        ).collect()
    }
    assert rel["big"]["alloc_tokens"] == 420 and rel["big"]["epochs"] == 2.1
    assert rel["small"]["weight"] == 0.0 and rel["small"]["alloc_tokens"] == 0
    with pytest.raises(ValueError, match="exactly one"):
        sampling.epochs_report(df)
    with pytest.raises(ValueError, match="exactly one"):
        sampling.epochs_report(df, budget_tokens=10, budget_epochs=1.0)
    with pytest.raises(ValueError, match="max_epochs"):
        sampling.epochs_report(df, budget_tokens=10, max_epochs=0)


def test_epochs_report_plan_bounded(spark):
    """Scale contract: one corpus-keyed groupBy; everything after is
    S-row arithmetic over a broadcast 1-row total — no window over the
    corpus, no sort, no merge join."""
    from orientdb_spark.pipeline import sampling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        sampling.epochs_report(docs, budget_epochs=3.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total


def test_moore_lewis_hand_checked(spark):
    """In-domain-typical docs score negative ce_diff, out-of-domain
    docs positive; OOV bigrams back off to the add-k floor instead of
    dropping; nll_gen matches lm_score on the same corpus."""
    import pytest

    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.sampling import moore_lewis_score
    from orientdb_spark.pipeline.text import lm_score

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha beta", "en"),
            (2, "alpha beta alpha beta", "en"),
            (3, "gamma delta gamma delta gamma", "fr"),
            (4, "alpha beta gamma", "fr"),
        ],
        ["doc_id", "text", "lang"],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in moore_lewis_score(docs, F.col("lang") == "en").collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # docs 1/2 are made of in-domain bigrams -> look MORE like the en
    # model than the mixed corpus; doc 3's bigrams are OOV for the en
    # model -> expensive there, cheap generally
    assert got[1]["ce_diff"] < 0 and got[2]["ce_diff"] < 0
    assert got[3]["ce_diff"] > 0
    # nll_gen must equal lm_score's corpus NLL (same model, same round)
    base = {r["doc_id"]: r["nll"] for r in lm_score(docs).collect()}
    for d in (1, 2, 3, 4):
        assert got[d]["nll_gen"] == base[d]
    with pytest.raises(ValueError, match="smoothing k"):
        moore_lewis_score(docs, F.col("lang") == "en", k=0.0)


def test_length_buckets_hand_checked(spark):
    """Bucket assignment, overflow handling, and the padded/waste
    arithmetic on hand-sized docs."""
    import pytest

    from orientdb_spark.pipeline.sampling import length_buckets

    docs = spark.createDataFrame(
        [
            (1, "a b c"),                # 3 tokens -> bucket cap 4
            (2, "a b c d"),              # 4 -> cap 4
            (3, "a b c d e"),            # 5 -> cap 8
            (4, " ".join(["w"] * 20)),   # 20 -> overflow (NULL cap)
        ],
        ["doc_id", "text"],
    )
    got = {
        r["bucket_id"]: r.asDict()
        for r in length_buckets(docs, bounds=(4, 8)).collect()
    }
    b0 = got[0]
    assert b0["bucket_cap"] == 4 and b0["n_docs"] == 2
    assert b0["max_len"] == 4 and b0["total_tokens"] == 7
    assert b0["padded_tokens"] == 8
    assert b0["waste_frac"] == round(1 / 8 + 1e-12, 6)
    assert got[1]["bucket_cap"] == 8 and got[1]["waste_frac"] == 0.0
    ov = got[2]
    assert ov["bucket_cap"] is None and ov["n_docs"] == 1
    with pytest.raises(ValueError, match="ascending"):
        length_buckets(docs, bounds=(8, 4))
