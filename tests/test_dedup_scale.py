"""Scale-safety of the near-dup operators: candidate generation must not
degenerate to the block-wide cross product, and the pruned paths must stay
EXACT (same output as all-pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orientdb_spark.pipeline import dedup
from orientdb_spark.pipeline.common import word_ngrams


def _blocked_allpairs_jaccard(docs, n, threshold):
    g = docs.select(
        "lang",
        "source",
        F.col("doc_id").alias("__id"),
        word_ngrams(F.col("text"), n).alias("__g"),
    )
    a = g.select("lang", "source", F.col("__id").alias("id_a"), F.col("__g").alias("__ga"))
    b = g.select("lang", "source", F.col("__id").alias("id_b"), F.col("__g").alias("__gb"))
    p = a.join(b, ["lang", "source"]).filter(F.col("id_a") < F.col("id_b"))
    jac = F.size(F.array_intersect("__ga", "__gb")).cast("double") / F.size(
        F.array_union("__ga", "__gb")
    )
    return (
        p.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


@pytest.fixture(scope="module")
def single_block_disjoint(spark):
    # 60 docs, ONE (lang, source) block, pairwise-disjoint vocabularies —
    # the worst case for blocking: all-pairs would emit 60*59/2 = 1770 rows
    rows = [
        (i, "en", "web", " ".join(f"w{i}_{j}" for j in range(12))) for i in range(60)
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])


def test_ngram_candidates_not_quadratic_on_single_block(single_block_disjoint):
    g = single_block_disjoint.select(
        "lang",
        "source",
        F.col("doc_id").alias("__id"),
        word_ngrams(F.col("text"), 2).alias("__g"),
    ).filter(F.size("__g") > 0)
    cand = dedup.ngram_candidate_pairs(g, threshold=0.5, block_cols=("lang", "source"))
    # disjoint grams → zero candidates (all-pairs would be 1770)
    assert cand.count() == 0


def test_ngram_prefix_filter_exact(spark):
    # overlapping docs in one block: prefix-filtered output == all-pairs
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, "en", "web", base),
        (1, "en", "web", base + " extra tail"),
        (2, "en", "web", base.replace("quick", "slow")),
        (3, "en", "web", "completely different words entirely here now"),
        (4, "en", "web", base + " more words to lower the overlap ratio somewhat"),
        (5, "en", "news", base),  # other block: never paired with 0-4
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.3).collect()
    )
    ref = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in _blocked_allpairs_jaccard(docs, 2, 0.3).collect()
    )
    assert got == ref and len(got) > 0


def test_candidate_cell_pairs_prunes_far_clusters():
    centers = {0: [1.0, 0.0], 1: [-1.0, 0.0]}
    radii = {0: 0.1, 1: 0.1}
    # eps small: opposite unit vectors (distance 2.0) can't pair
    pairs = set(dedup.candidate_cell_pairs(centers, radii, eps=0.2))
    assert (0, 0) in pairs and (1, 1) in pairs
    assert (0, 1) not in pairs and (1, 0) not in pairs
    # eps big enough: everything is a candidate
    assert len(dedup.candidate_cell_pairs(centers, radii, eps=2.0)) == 4


def test_embedding_pairs_exact_vs_allpairs(spark):
    # two tight clusters far apart + noise; ball pruning must return
    # exactly the all-pairs result
    import math

    def v(angle):
        return [math.cos(angle), math.sin(angle), 0.0, 0.0]

    rows = []
    for i in range(8):
        rows.append((i, "a", v(0.01 * i)))  # cluster at angle≈0
    for i in range(8, 16):
        rows.append((i, "a", v(math.pi / 2 + 0.01 * i)))  # cluster at 90°
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    got = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in dedup.embedding_duplicate_pairs(df, threshold=0.99, n_cells=4).collect()
    )
    # brute-force reference
    from orientdb_spark.pipeline.common import cosine_similarity

    a = df.select("label", F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select("label", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    ref = (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= 0.99)
        .select("id_a", "id_b", "cosine")
    )
    ref_rows = sorted((r.id_a, r.id_b, r.cosine) for r in ref.collect())
    assert got == ref_rows and len(got) > 0


def test_minhash_bucket_cap_drops_hot_bucket(spark):
    # 30 identical docs → every band bucket holds all 30; a cap below 30
    # removes them from candidate generation entirely
    rows = [(i, "same exact text repeated for everyone here okay") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = dedup.minhash_lsh_pairs(docs, threshold=0.9, max_bucket_size=None)
    assert uncapped.count() == 30 * 29 // 2
    capped = dedup.minhash_lsh_pairs(docs, threshold=0.9, max_bucket_size=10)
    assert capped.count() == 0
    sizes = dedup.minhash_bucket_sizes(docs)
    assert all(r.n_docs == 30 for r in sizes.collect())


def test_minhash_incremental_matches_full_restricted(spark):
    """The incremental contract: batch-vs-corpus pairs == the full-run
    pair set restricted to pairs with >= 1 new side — values included —
    both with postings derived in-call and with a precomputed
    ``minhash_postings`` index (the persist-and-reuse path)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter("doc_id % 10 = 0")
    corpus = docs.filter("doc_id % 10 != 0")
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.7).collect()
        if r.id_a % 10 == 0 or r.id_b % 10 == 0
    }
    assert full, "fixture must produce cross pairs"
    inc = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs_incremental(
            new, corpus, threshold=0.7
        ).collect()
    }
    assert inc == full
    posts = dedup.minhash_postings(corpus)
    via_index = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs_incremental(
            new, corpus, threshold=0.7, corpus_postings=posts
        ).collect()
    }
    assert via_index == full


def test_minhash_incremental_cap_parity_across_boundary(spark):
    """Bucket-cap verdicts must see the COMBINED bucket: 25 corpus
    copies + 5 new copies of one text = a 30-member bucket, so a cap of
    10 drops it in the incremental run exactly as the full run would —
    even though the batch alone is under the cap."""
    text = "same exact text repeated for everyone here okay"
    corpus = spark.createDataFrame(
        [(i, text) for i in range(25)], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(100 + i, text) for i in range(5)], ["doc_id", "text"]
    )
    capped = dedup.minhash_lsh_pairs_incremental(
        new, corpus, threshold=0.9, max_bucket_size=10
    )
    assert capped.count() == 0
    uncapped = dedup.minhash_lsh_pairs_incremental(
        new, corpus, threshold=0.9, max_bucket_size=None
    )
    # >=1-new pairs only: 5 new x 25 old + C(5,2) new x new
    assert uncapped.count() == 5 * 25 + 10
    assert uncapped.filter("id_a >= 100 and id_b >= 100").count() == 10


def test_minhash_incremental_corpus_side_never_shuffled(spark):
    """Scale pin: the corpus posting list must stream against the
    BROADCAST batch keys — a corpus-side hash exchange before the probe
    join would re-shuffle the whole index every batch. The only
    full-width exchanges allowed are over TOUCHED postings (bucket
    reassembly) and candidate verification."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter("doc_id % 50 = 0")
    corpus = docs.filter("doc_id % 50 != 0")
    posts = dedup.minhash_postings(corpus)
    out = dedup.minhash_lsh_pairs_incremental(
        new, corpus, threshold=0.7, corpus_postings=posts
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the probe of the corpus index must be broadcast-shaped: no sort-
    # merge join anywhere in the incremental pipeline
    assert "SortMergeJoin" not in plan, plan


def test_minhash_shingler_evaluated_once_in_plan(spark):
    """r13 optimization pin (guide §4.4): the Arrow shingler is marked
    non-deterministic so the size(__toks)>0 filter cannot be pushed
    below its projection — the push duplicated the ArrowEvalPython node
    and the corpus was shingled TWICE per pass. Exactly one shingles()
    evaluation may appear in the shingle stage's plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh = dedup._shingle_stage(docs, "text", "doc_id", 3)
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan


def test_embedding_pairs_grouped_verifier_plan(spark):
    """r7 scale rearchitecture pin: the verification stage must fan
    members out through ONE broadcast join and ONE hash exchange into
    FlatMapGroupsInPandas — candidate pairs must never materialize as
    shuffle-joined rows (the former SortMergeJoin of a/b member sides
    was O(candidate pairs) of shuffle volume: 111 s at sf1)."""
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = dedup.embedding_duplicate_pairs(embs, threshold=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # exactly one row-shuffling exchange (the groupBy); broadcasts are fine
    n_exchanges = plan.count("+- Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_embedding_pairs_random_property_vs_bruteforce(spark):
    """Property check beyond the fixture corpora: random clustered +
    isotropic vectors, several thresholds — grouped verification equals
    the label-blocked brute force exactly (values included)."""
    import numpy as np

    rng = np.random.default_rng(77)
    rows = []
    cents = rng.normal(0, 1, (3, 8))
    for i in range(120):
        if i % 3 == 0:
            v = rng.normal(0, 1, 8)  # isotropic
        else:
            v = cents[i % 3] + rng.normal(0, 0.15, 8)  # clustered
        v = v / np.linalg.norm(v)
        rows.append((i, f"b{i % 2}", [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    from orientdb_spark.pipeline.common import cosine_similarity

    for thr, cells in ((0.95, 4), (0.5, 3), (0.0, 2)):
        got = sorted(
            map(
                tuple,
                dedup.embedding_duplicate_pairs(
                    df, threshold=thr, n_cells=cells
                ).collect(),
            )
        )
        a = df.select("label", F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        b = df.select("label", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        ref = sorted(
            (r.id_a, r.id_b, r.cosine)
            for r in a.join(b, "label")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", F.round(cosine_similarity(F.col("va"), F.col("vb")), 6))
            .filter(F.col("cosine") >= thr)
            .select("id_a", "id_b", "cosine")
            .collect()
        )
        assert got == ref, (thr, cells, len(got), len(ref))


def test_embedding_pairs_unblocked(spark):
    """block_col=None mines the whole corpus: cross-label pairs appear
    that label blocking would hide; result equals unblocked brute
    force."""
    import math

    def v(angle):
        return [math.cos(angle), math.sin(angle), 0.0]

    df = spark.createDataFrame(
        [(0, "x", v(0.0)), (1, "y", v(0.005)), (2, "x", v(1.2))],
        ["vec_id", "label", "embedding"],
    )
    got = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_duplicate_pairs(
            df, block_col=None, threshold=0.99, n_cells=2
        ).collect()
    }
    assert got == {(0, 1)}  # cross-label pair found
    blocked = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_duplicate_pairs(
            df, threshold=0.99, n_cells=2
        ).collect()
    }
    assert blocked == set()  # same pair hidden by label blocking


def test_embedding_pairs_imi_blocking_bit_identical(spark):
    """IMI product-cell blocking must return EXACTLY what flat-IVF
    blocking returns (both are lossless ball pruning over different
    cell partitions) on a real corpus, including with the occupancy
    guard forcing splits and with block_col=None."""
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    flat = sorted(
        map(tuple, dedup.embedding_duplicate_pairs(embs, threshold=0.3).collect())
    )
    imi = sorted(
        map(
            tuple,
            dedup.embedding_duplicate_pairs(
                embs, threshold=0.3, blocking="imi", k_half=4
            ).collect(),
        )
    )
    assert imi == flat and len(flat) > 0
    # derived k_half path + forced occupancy splits, unblocked corpus
    flat_u = sorted(
        map(
            tuple,
            dedup.embedding_duplicate_pairs(
                embs, threshold=0.3, block_col=None, max_cell_occupancy=40
            ).collect(),
        )
    )
    imi_u = sorted(
        map(
            tuple,
            dedup.embedding_duplicate_pairs(
                embs, threshold=0.3, block_col=None, blocking="imi",
                max_cell_occupancy=40,
            ).collect(),
        )
    )
    assert imi_u == flat_u and len(flat_u) > 0


def test_embedding_pairs_blocking_validation(spark):
    import pytest as _pytest

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with _pytest.raises(ValueError, match="blocking"):
        dedup.embedding_duplicate_pairs(embs, blocking="hnsw")


def test_candidate_cell_pairs_vectorized_matches_reference():
    """The numpy pairwise form must reproduce the scalar double-loop
    reference (modulo the documented norm-relative lossless slack, which
    can only ADD pairs — assert superset + equality away from
    boundaries)."""
    import math
    import random

    rng = random.Random(5)
    centers = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(12)}
    radii = {i: rng.uniform(0, 0.4) for i in range(12)}
    eps = 0.3
    got = set(dedup.candidate_cell_pairs(centers, radii, eps))
    ref = set()
    for i in centers:
        for j in centers:
            d = math.sqrt(sum((x - y) ** 2 for x, y in zip(centers[i], centers[j])))
            if d <= radii[i] + radii[j] + eps:
                ref.add((i, j))
    assert ref <= got  # slack never drops a candidate
    # and no pair is admitted that the reference rejects by more than
    # the documented slack (1e-7 · max(1, ‖c_i‖, ‖c_j‖))
    def _nrm(c):
        return math.sqrt(sum(x * x for x in c))

    for i, j in got - ref:
        d = math.sqrt(sum((x - y) ** 2 for x, y in zip(centers[i], centers[j])))
        slack = 1e-7 * max(1.0, _nrm(centers[i]), _nrm(centers[j]))
        assert d <= radii[i] + radii[j] + eps + slack * 1.01, (i, j, d)


def test_candidate_cell_pairs_self_pair_survives_cancellation():
    """d(c, c) is identically zero, but the vectorized expansion
    ‖a‖²+‖b‖²−2a·b leaves a cancellation residual (~1e-16 on unit
    vectors) whose sqrt (~1e-8) exceeded the old fixed 1e-9 slack —
    at threshold ≈ 1.0 (r_i ≈ eps ≈ 0, exact-duplicate mining) a
    self-pair could be silently pruned, violating the EXACT contract.
    The diagonal must be pinned to 0 and coincident DISTINCT cells
    must survive via the norm-relative slack."""
    import math
    import random

    rng = random.Random(17)
    # a unit vector with many irrational components — maximizes the
    # cancellation residual of the expansion
    raw = [rng.gauss(0, 1) for _ in range(64)]
    n = math.sqrt(sum(x * x for x in raw))
    u = [x / n for x in raw]
    # cells 0 and 1 are bit-identical centroids (two cells whose members
    # all equal the same seed), radii exactly 0, eps exactly 0
    centers = {0: list(u), 1: list(u)}
    radii = {0: 0.0, 1: 0.0}
    got = set(dedup.candidate_cell_pairs(centers, radii, eps=0.0))
    assert (0, 0) in got and (1, 1) in got  # diagonal pinned to d=0
    assert (0, 1) in got and (1, 0) in got  # coincident distinct cells


def test_imi_occupied_centroids_sparse_allocation():
    """Driver allocation for IMI product centroids must be
    O(occupied · d), never O(k_half² · d): with k_half=4096 and three
    occupied cells the dict has exactly three entries, each the
    concatenation books[0][cid1] ++ books[1][cid2]."""
    import numpy as np

    k_half = 4096
    rng = np.random.default_rng(3)
    books = [rng.normal(size=(k_half, 4)), rng.normal(size=(k_half, 4))]
    occ = [0, 5, 3 * k_half + 7]
    cents = dedup._imi_occupied_centroids(books, occ, k_half)
    assert set(cents) == set(occ) and len(cents) == 3
    assert cents[3 * k_half + 7] == list(books[0][3]) + list(books[1][7])
    assert cents[5] == list(books[0][0]) + list(books[1][5])


def test_embedding_pairs_imi_tiny_corpus(spark):
    """blocking='imi' with k_half=None on a corpus smaller than the old
    floor of 4 must work (derived k_half clamps to the corpus size)
    and match the flat path, like the flat path always did."""
    import math

    def v(angle):
        return [math.cos(angle), math.sin(angle)]

    df = spark.createDataFrame(
        [(0, "x", v(0.0)), (1, "x", v(0.004)), (2, "x", v(1.0))],
        ["vec_id", "label", "embedding"],
    )
    flat = sorted(
        map(tuple, dedup.embedding_duplicate_pairs(df, threshold=0.99).collect())
    )
    imi = sorted(
        map(
            tuple,
            dedup.embedding_duplicate_pairs(
                df, threshold=0.99, blocking="imi"
            ).collect(),
        )
    )
    assert imi == flat == [(0, 1, flat[0][2])]


def test_embedding_pairs_auto_cells_bit_identical(spark):
    """n_cells='auto' (√N clamped to [16, 4096], guard-backed) must
    return exactly what the 16-cell default returns — blocking is
    output-invariant — on a real corpus, blocked and unblocked."""
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = sorted(
        map(tuple, dedup.embedding_duplicate_pairs(embs, threshold=0.3).collect())
    )
    auto = sorted(
        map(
            tuple,
            dedup.embedding_duplicate_pairs(
                embs, threshold=0.3, n_cells="auto"
            ).collect(),
        )
    )
    assert auto == base and len(base) > 0


def test_embedding_pairs_effectiveness_guard(spark):
    """The r9 perf-weak closure: an ISOTROPIC corpus (radii ≈ √2, zero
    pruning) with n_cells=√N must trigger the pruning-effectiveness
    guard — a loud RuntimeWarning plus auto-coarsening to ≤16 cells —
    instead of launching the N·√N-row verify explosion (the 77 GB
    spill BENCH.md measured at sf10). Output must stay bit-identical
    to the default 16-cell run, which must NOT warn."""
    import math
    import random
    import warnings as W

    rng = random.Random(11)
    rows = []
    for i in range(500):
        raw = [rng.gauss(0, 1) for _ in range(8)]
        n = math.sqrt(sum(x * x for x in raw))
        rows.append((i, [x / n for x in raw]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    with W.catch_warnings():
        W.simplefilter("error", RuntimeWarning)  # default path must not warn
        base = sorted(
            map(
                tuple,
                dedup.embedding_duplicate_pairs(
                    df, block_col=None, threshold=0.3, n_cells=16
                ).collect(),
            )
        )
    with pytest.warns(RuntimeWarning, match="ball pruning is ineffective"):
        guarded_df = dedup.embedding_duplicate_pairs(
            df, block_col=None, threshold=0.3, n_cells=64
        )
    guarded = sorted(map(tuple, guarded_df.collect()))
    assert guarded == base and len(base) > 0


# ---- SemDeDup (semantic_dedup) ----


def test_semantic_dedup_planted_duplicates(spark):
    """Exact-duplicate vectors land in one cell (identical assignment)
    and all but the lowest id are dropped; distinct directions survive;
    the zero vector is kept with cid -1."""
    import math

    def v(angle):
        return [math.cos(angle), math.sin(angle), 0.0]

    df = spark.createDataFrame(
        [
            (0, v(0.0)),
            (1, v(0.0)),          # exact dup of 0
            (2, v(0.0002)),       # near-dup of 0/1 (cos ~ 1)
            (3, v(1.2)),          # distinct direction
            (4, [0.0, 0.0, 0.0]),  # zero-norm: kept, cid -1
        ],
        ["vec_id", "embedding"],
    )
    got = {r.vec_id: r for r in dedup.semantic_dedup(df, threshold=0.99, n_cells=2).collect()}
    assert len(got) == 5
    assert got[0].is_kept and not got[1].is_kept and not got[2].is_kept
    assert got[3].is_kept
    assert got[4].is_kept and got[4].cid == -1
    assert got[0].cid == got[1].cid == got[2].cid


def test_semantic_dedup_survivor_rule_behavioral(spark):
    """End-to-end behavioral check on the real sf0.001 corpus: using the
    operator's OWN cluster assignment, a vector is dropped iff a
    smaller-id member of the same cell has round(cosine, 6) >=
    threshold — recomputed independently in numpy."""
    import numpy as np

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = dedup.semantic_dedup(embs, threshold=0.3).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in embs.select("vec_id", "embedding").collect()
    }
    by_cell: dict[int, list[int]] = {}
    for r in out:
        if r.cid >= 0:
            by_cell.setdefault(r.cid, []).append(r.vec_id)
    kept = {r.vec_id: r.is_kept for r in out}
    n_dropped = 0
    for cid, ids in by_cell.items():
        ids.sort()
        for i, b in enumerate(ids):
            vb = vecs[b]
            has_smaller = False
            for a in ids[:i]:
                va = vecs[a]
                cos = round(
                    float(va @ vb)
                    / (float(np.sqrt(va @ va)) * float(np.sqrt(vb @ vb))),
                    6,
                )
                if cos >= 0.3:
                    has_smaller = True
                    break
            assert kept[b] == (not has_smaller), (b, cid)
            n_dropped += int(has_smaller)
    assert n_dropped > 0  # the corpus actually has within-cell dups at 0.3


def test_semantic_dedup_occupancy_split_invariant(spark):
    """Forcing the occupancy split (tiny max_cell_occupancy) must not
    change the keep decisions — subcell groups partition the
    within-cell pair set exactly."""
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = sorted(
        (r.vec_id, r.cid, r.is_kept)
        for r in dedup.semantic_dedup(embs, threshold=0.3).collect()
    )
    split = sorted(
        (r.vec_id, r.cid, r.is_kept)
        for r in dedup.semantic_dedup(
            embs, threshold=0.3, max_cell_occupancy=7
        ).collect()
    )
    assert base == split


def test_semantic_dedup_lsh_planted_twins_and_contract(spark):
    """The cells-scale-with-N variant: exact-duplicate vectors share a
    sign bucket by construction (identical dots -> identical bits), so
    planted twins always dedup; the zero vector keeps cid -1; and the
    survivor rule matches a numpy replay of the operator's own bucket
    assignment on the real sf0.001 corpus."""
    import math

    import numpy as np

    def v(angle):
        return [math.cos(angle), math.sin(angle)] + [0.0] * 62

    df = spark.createDataFrame(
        [
            (0, v(0.0)),
            (1, v(0.0)),            # exact twin of 0 -> same bucket, dropped
            (2, v(1.2)),            # distinct direction
            (3, [0.0] * 64),        # zero-norm: kept, cid -1
        ],
        ["vec_id", "embedding"],
    )
    got = {
        r.vec_id: r
        for r in dedup.semantic_dedup_lsh(df, threshold=0.99).collect()
    }
    assert got[0].is_kept and not got[1].is_kept
    assert got[0].cid == got[1].cid
    assert got[2].is_kept
    assert got[3].is_kept and got[3].cid == -1

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = dedup.semantic_dedup_lsh(embs, threshold=0.3).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in embs.select("vec_id", "embedding").collect()
    }
    by_cell: dict[int, list[int]] = {}
    for r in out:
        if r.cid >= 0:
            by_cell.setdefault(r.cid, []).append(r.vec_id)
    kept = {r.vec_id: r.is_kept for r in out}
    n_dropped = 0
    for cid, ids in by_cell.items():
        ids.sort()
        for i, b in enumerate(ids):
            vb = vecs[b]
            has_smaller = any(
                round(
                    float(vecs[a] @ vb)
                    / (float(np.sqrt(vecs[a] @ vecs[a])) * float(np.sqrt(vb @ vb))),
                    6,
                )
                >= 0.3
                for a in ids[:i]
            )
            assert kept[b] == (not has_smaller), (b, cid)
            n_dropped += int(has_smaller)
    assert n_dropped > 0


def test_derive_semantic_lsh_planes_exact_bounds():
    """Integer-exact derivation: smallest p in [4, 20] with n <= 32*2^p
    — including the exact power-of-two boundaries an FP log2 could
    mis-round."""
    from orientdb_spark.pipeline.dedup import derive_semantic_lsh_planes

    assert derive_semantic_lsh_planes(1) == 4
    assert derive_semantic_lsh_planes(32 * 16) == 4       # boundary stays
    assert derive_semantic_lsh_planes(32 * 16 + 1) == 5   # first past it
    assert derive_semantic_lsh_planes(32 * (1 << 20)) == 20
    assert derive_semantic_lsh_planes(10 ** 12) == 20     # clamp
    with pytest.raises(ValueError, match="n_corpus"):
        derive_semantic_lsh_planes(0)


def test_embedding_decontaminate_planted(spark):
    """A train vector that paraphrases (near-copies) a refset vector is
    dropped; unrelated directions survive; zero-norm train rows are
    kept; refset members present in train drop themselves (cos = 1)."""
    import math

    def v(angle):
        return [math.cos(angle), math.sin(angle)]

    train = spark.createDataFrame(
        [
            (0, v(0.0)),        # == ref 100 -> dropped
            (1, v(0.002)),      # near-copy of ref -> dropped
            (2, v(1.3)),        # unrelated -> kept
            (3, [0.0, 0.0]),    # zero-norm -> kept
        ],
        ["vec_id", "embedding"],
    )
    ref = spark.createDataFrame([(100, v(0.0))], ["vec_id", "embedding"])
    kept = {
        r.vec_id
        for r in dedup.embedding_decontaminate(train, ref, threshold=0.99).collect()
    }
    assert kept == {2, 3}
    # zero-norm refset rows never match anything
    zref = spark.createDataFrame([(200, [0.0, 0.0])], ["vec_id", "embedding"])
    kept2 = {
        r.vec_id
        for r in dedup.embedding_decontaminate(train, zref, threshold=0.5).collect()
    }
    assert kept2 == {0, 1, 2, 3}
    # the bounded-refset contract is enforced, with the ANN pointer
    with pytest.raises(ValueError, match="max_ref_rows"):
        dedup.embedding_decontaminate(train, train, threshold=0.5, max_ref_rows=2)


def test_decontaminate_and_semantic_edge_inputs(spark):
    """Review-sweep edges: NULL / empty-array / dimension-mismatched
    train embeddings are 'no cosine definable' rows (kept), an
    all-zero-norm corpus returns the zero branch, and a typo'd n_cells
    string fails loudly."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    train = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, []), (3, [1.0, 0.0, 0.0]),
         (4, [0.0, 0.0])],
        schema,
    )
    ref = spark.createDataFrame([(100, [1.0, 0.0])], ["vec_id", "embedding"])
    kept = {
        r.vec_id
        for r in dedup.embedding_decontaminate(train, ref, threshold=0.9).collect()
    }
    assert kept == {1, 2, 3, 4}  # only the true match (0) is dropped
    # all-zero-norm corpus: semantic_dedup returns the zero branch
    zeros = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])], schema
    )
    out = {(r.vec_id, r.cid, r.is_kept)
           for r in dedup.semantic_dedup(zeros).collect()}
    assert out == {(0, -1, True), (1, -1, True)}
    # typo'd n_cells string fails with a clear error, not a Py4J dump
    import pytest as _pytest

    embs = spark.createDataFrame([(0, [1.0, 0.0])], schema)
    with _pytest.raises(ValueError, match="n_cells"):
        dedup.embedding_duplicate_pairs(embs, n_cells="Auto", block_col=None)


def test_decontamination_report_planted_leak(spark):
    """A benchmark doc pasted into two training docs is reported under
    that ref id with the right count and the deterministic worst
    offender; an untouched ref doc produces no row."""
    eval_text = (
        "what is the capital of france the capital of france is paris "
        "and it has been since the tenth century more or less"
    )
    other = "completely unrelated prose about gardening and soil quality"
    refset = spark.createDataFrame(
        [(900, eval_text), (901, other)], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "intro text " + eval_text[:45] + " outro text"),  # partial paste
            (2, eval_text),                                       # verbatim copy
            (3, "nothing in common with either reference doc"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.ref_id: r
        for r in dedup.decontamination_report(
            train, refset, min_shared=2
        ).collect()
    }
    assert 901 not in rows
    rep = rows[900]
    assert rep.n_contaminated == 2
    # doc 2 IS the ref text -> shares every ref fingerprint; doc 1 pastes
    # only a prefix, so its overlap is strictly smaller
    assert rep.top_train_id == 2
    assert rep.max_shared >= 2
    # ties break to the smallest train id: two verbatim copies
    tie_train = spark.createDataFrame(
        [(7, eval_text), (5, eval_text)], ["doc_id", "text"]
    )
    tied = dedup.decontamination_report(
        tie_train, refset, min_shared=2
    ).collect()
    assert {(r.ref_id, r.top_train_id) for r in tied} == {(900, 5)}


def test_decontamination_report_count_hint_skips_job(spark, monkeypatch):
    """The broadcast gate's refset.count() job (r12 advice) is skipped
    when the caller passes refset_count_hint, or broadcast_refset_max=
    None — pinned by making DataFrame.count raise during plan
    construction. Values must be identical on all three paths."""
    eval_text = (
        "what is the capital of france the capital of france is paris "
        "and it has been since the tenth century more or less"
    )
    refset = spark.createDataFrame([(900, eval_text)], ["doc_id", "text"])
    train = spark.createDataFrame(
        [(1, eval_text), (2, "nothing shared here at all")],
        ["doc_id", "text"],
    )
    base = sorted(map(tuple, dedup.decontamination_report(
        train, refset, min_shared=2).collect()))

    from pyspark.sql import DataFrame as _DF

    def _boom(self):
        raise AssertionError("count() job ran despite hint/None gate")

    monkeypatch.setattr(_DF, "count", _boom)
    hinted = dedup.decontamination_report(
        train, refset, min_shared=2, refset_count_hint=1)
    nogate = dedup.decontamination_report(
        train, refset, min_shared=2, broadcast_refset_max=None)
    monkeypatch.undo()
    assert sorted(map(tuple, hinted.collect())) == base
    assert sorted(map(tuple, nogate.collect())) == base


def test_embedding_decontaminate_blas_parity_with_sequential_fold(spark):
    """r11 dgemm fast path: verdicts must match a pure sequential-fold
    reference (the oracle arithmetic) on EVERY row — random rows, rows
    planted within the 1e-9 rounding-boundary guard window (where only
    the exact-fold recompute is trustworthy), zero-norm and NULL rows —
    catching both FP drift and any fast-path indexing slip."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    rng = np.random.default_rng(123)
    d, t = 16, 0.3
    refs = rng.normal(size=(50, d))
    rows, vecs = [], {}
    for i in range(200):
        v = rng.normal(size=d)
        rows.append((i, [float(x) for x in v]))
    # boundary plants: cosine to ref0 within ~1e-16 of a 0.5e-6 midpoint
    r0 = refs[0] / math.sqrt(float(refs[0] @ refs[0]))
    orth = rng.normal(size=d)
    orth -= (orth @ r0) * r0
    orth /= math.sqrt(float(orth @ orth))
    for j, c in enumerate((0.2999995, 0.3000005, 0.2999985)):
        v = c * r0 + math.sqrt(1 - c * c) * orth
        rows.append((300 + j, [float(x) for x in v]))
    rows.append((400, [0.0] * d))          # zero-norm: kept
    rows.append((401, None))               # NULL: kept
    rows.append((402, [1.0, 2.0]))         # dim mismatch: kept
    train = spark.createDataFrame(rows, ["vec_id", "embedding"])
    refset = spark.createDataFrame(
        [(1000 + i, [float(x) for x in r]) for i, r in enumerate(refs)],
        ["vec_id", "embedding"],
    )
    kept = {
        r.vec_id
        for r in dedup.embedding_decontaminate(
            train, refset, threshold=t
        ).collect()
    }
    # reference: per-row sequential fold + HALF_UP 6-dp round (the
    # Spark/DuckDB convention)
    Rn = np.zeros(len(refs))
    for dd in range(d):
        Rn += refs[:, dd] * refs[:, dd]
    Rn = np.sqrt(Rn)
    expected = set()
    for i, emb in rows:
        if emb is None or len(emb) != d:
            expected.add(i)
            continue
        v = np.asarray(emb)
        vn = 0.0
        for dd in range(d):
            vn += v[dd] * v[dd]
        vn = math.sqrt(vn)
        if vn <= 0:
            expected.add(i)
            continue
        dots = np.zeros(len(refs))
        for dd in range(d):
            dots += v[dd] * refs[:, dd]
        mc = float((dots / (vn * Rn)).max())
        rounded = float(
            Decimal(mc).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )
        if not (rounded >= t):
            expected.add(i)
    assert kept == expected


def test_semantic_dedup_lsh_derives_dim_and_rejects_mixed(spark):
    """dim=None (the default) derives the embedding width from the data
    — an 8-dim corpus must NOT silently collapse into one bucket (the
    64-dim zip_with padding would null every plane dot); mixed widths
    raise instead of degenerating."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(256)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = dedup.semantic_dedup_lsh(df, threshold=0.99)
    cids = {r.cid for r in out.collect()}
    assert len(cids) > 1, "8-dim corpus collapsed into one bucket"
    mixed = spark.createDataFrame(
        rows[:4] + [(999, [1.0] * 12)], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="mixed embedding dimensions"):
        dedup.semantic_dedup_lsh(mixed, threshold=0.99)


def test_cluster_size_report_partitions_corpus(spark):
    """Buckets partition the corpus (frac sums to 1, docs sum to N),
    n_removable counts keep-one deletions, and sizes bin into the
    right half-open ranges."""
    from orientdb_spark.pipeline.dedup import cluster_size_report

    rows = (
        [(i, f"unique {i}") for i in range(5)]       # five size-1
        + [(10 + i, "pair") for i in range(2)]       # one size-2
        + [(20 + i, "quad") for i in range(4)]       # one size-4
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["bucket_id"]: r.asDict() for r in cluster_size_report(df).collect()}
    assert got[0]["n_clusters"] == 5 and got[0]["n_docs"] == 5
    assert got[0]["n_removable"] == 0
    assert got[1]["n_docs"] == 2 and got[1]["n_removable"] == 1
    assert got[2]["n_docs"] == 4 and got[2]["n_removable"] == 3
    assert (got[2]["bucket_lo"], got[2]["bucket_hi"]) == (3, 4)
    assert sum(r["n_docs"] for r in got.values()) == 11
    assert abs(sum(r["frac_of_corpus"] for r in got.values()) - 1.0) < 1e-5
