"""Scalar quantization unit tests (oracle twin in test_entry.py)."""

import pytest
from pyspark.sql import functions as F

from orientdb_spark.pipeline.quantize import scalar_quantize


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (1, [0.0, 10.0, 5.0]),
            (2, [1.0, 10.0, 5.0]),   # dim 1 and 2 constant across corpus? no: dim0 varies
            (3, [0.5, 10.0, 5.0]),
        ],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )


def test_quantize_codes_and_bounds(vecs):
    out = {r["vec_id"]: r for r in scalar_quantize(vecs, bits=8).collect()}
    # dim 0 spans [0, 1]: 0.0 -> 0, 1.0 -> clamped 255, 0.5 -> 128
    assert out[1]["codes"][0] == 0
    assert out[2]["codes"][0] == 255
    assert out[3]["codes"][0] == 128
    # constant dims code to 0 with zero error contribution
    assert out[1]["codes"][1] == 0 and out[1]["codes"][2] == 0
    for r in out.values():
        assert all(0 <= c <= 255 for c in r["codes"])
        # midpoint reconstruction error bounded by half a quantization step
        assert r["max_abs_err"] <= (1.0 / 256) * 0.5 + 1e-12


def test_quantize_bit_width(vecs):
    out = {r["vec_id"]: r for r in scalar_quantize(vecs, bits=2).collect()}
    assert all(0 <= c <= 3 for r in out.values() for c in r["codes"])
    with pytest.raises(ValueError):
        scalar_quantize(vecs, bits=0)


def test_quantize_error_reconstructs(vecs):
    """1-bit error bound: half the (larger) step of a 2-level grid."""
    out = scalar_quantize(vecs, bits=1)
    max_err = out.agg(F.max("max_abs_err")).first()[0]
    assert max_err <= 0.5 / 2 + 1e-12  # dim0 range 1.0, 2 levels -> step .5


def test_quantize_property_random_vectors(spark):
    """Property: codes stay in [0, 2^bits), reconstruction error is
    bounded by half a quantization step of each dim's range, and
    extreme values hit the extreme codes."""
    import random

    rng = random.Random(7)
    dims = 6
    rows = [
        (i, [rng.uniform(-5, 5) for _ in range(dims)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    out = scalar_quantize(df, bits=6).collect()
    # per-dim ranges from the raw data
    mins = [min(r[1][d] for r in rows) for d in range(dims)]
    maxs = [max(r[1][d] for r in rows) for d in range(dims)]
    half_step = max((maxs[d] - mins[d]) / 64 / 2 for d in range(dims))
    for r in out:
        assert all(0 <= c < 64 for c in r["codes"])
        assert r["max_abs_err"] <= half_step + 1e-12
    by_id = {r["vec_id"]: r["codes"] for r in out}
    for d in range(dims):
        lo_id = min(rows, key=lambda x: x[1][d])[0]
        hi_id = max(rows, key=lambda x: x[1][d])[0]
        assert by_id[lo_id][d] == 0
        assert by_id[hi_id][d] == 63


def test_sign_rp_preserves_norms_and_separations(spark):
    """JL sanity at out_dim=32: projected squared norms concentrate
    around the originals, and the projection is linear + deterministic."""
    import random

    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.quantize import sign_random_projection

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r["proj"] for r in
           sign_random_projection(df, in_dim=64, out_dim=32).collect()}
    ok = 0
    for i, v in rows:
        orig = sum(x * x for x in v)
        proj = sum(y * y for y in out[i])
        if 0.5 <= proj / orig <= 1.6:
            ok += 1
    assert ok >= 54, f"norm preservation failed for {60 - ok}/60 vectors"
    # determinism across invocations
    again = {r["vec_id"]: r["proj"] for r in
             sign_random_projection(df, in_dim=64, out_dim=32).collect()}
    assert again == out


def test_sign_rp_zero_shuffle_plan(spark):
    import re

    from orientdb_spark.pipeline.quantize import sign_random_projection

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = sign_random_projection(embs, in_dim=64, out_dim=8)
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE)) == 0, plan


def test_pca_matches_numpy_reference(spark):
    """Distributed partial-covariance fit must agree with plain numpy
    PCA on the collected corpus: same components (after the shared sign
    convention), same explained-variance ratios, same projections."""
    import numpy as np

    from orientdb_spark.pipeline.quantize import pca_fit, pca_project

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    model = pca_fit(df, n_components=8)
    x = np.stack([r["embedding"] for r in df.orderBy("vec_id").collect()]).astype(
        np.float64
    )
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    comps = evecs[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["components"], comps, atol=1e-7)
    ev = np.clip(evals[order], 0, None) / np.clip(evals, 0, None).sum()
    assert np.allclose(model["explained_variance_ratio"], ev, atol=1e-9)
    # projections: narrow Column transform == numpy (x - mean) @ C.T
    proj = {
        r["vec_id"]: np.array(r["proj"])
        for r in pca_project(df, model).collect()
    }
    want = (x - mean) @ np.array(model["components"]).T
    ids = [r["vec_id"] for r in df.orderBy("vec_id").collect()]
    got = np.stack([proj[i] for i in ids])
    assert np.allclose(got, want, atol=1e-7)
    # component variances recover the eigenvalues (the PCA contract)
    assert np.allclose(got.var(axis=0), np.clip(evals[order], 0, None), atol=1e-7)


def test_pca_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.quantize import pca_fit

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError):
        pca_fit(df, n_components=0)
    with pytest.raises(ValueError):
        pca_fit(df, n_components=65)  # > dim
    with pytest.raises(ValueError):
        pca_fit(df.filter(F.lit(False)))


# ------------------------------------------------------ product quantization


def _pq_numpy_reference(X, books):
    """Sequential PQ encode reference: same dimension-major fold,
    6-dp round, lower-code ties."""
    import numpy as np

    m = len(books)
    dsub = len(books[0][0])
    codes = []
    for x in X:
        row = []
        for s in range(m):
            xs = x[s * dsub:(s + 1) * dsub]
            dists = []
            for c in books[s]:
                acc = 0.0
                for d in range(dsub):
                    acc += (xs[d] - c[d]) * (xs[d] - c[d])
                dists.append(round(acc, 6))
            row.append(int(np.argmin(dists)))
        codes.append(row)
    return codes


def test_pq_encode_matches_sequential_reference(spark):
    import numpy as np

    from orientdb_spark.pipeline.quantize import pq_encode, pq_fit

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_fit(embs, m=8, k=16, refine_iters=0)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(embs, books).collect()
    }
    rows = embs.select("vec_id", "embedding").collect()
    X = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    ids = sorted(X)[:80]  # sequential reference is slow; spot-check 80
    want = _pq_numpy_reference([X[i] for i in ids], books)
    assert [got[i] for i in ids] == want


def test_pq_fit_refinement_reduces_distortion(spark):
    """One Lloyd step must not increase total quantization error
    (k-means monotonicity), and usually strictly reduces it."""
    import numpy as np

    from orientdb_spark.pipeline.quantize import pq_encode, pq_fit

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = embs.select("vec_id", "embedding").collect()
    X = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}

    def distortion(books):
        B = [np.asarray(b) for b in books]
        dsub = B[0].shape[1]
        codes = {
            r["vec_id"]: r["codes"] for r in pq_encode(embs, books).collect()
        }
        tot = 0.0
        for i, x in X.items():
            for s, c in enumerate(codes[i]):
                diff = x[s * dsub:(s + 1) * dsub] - B[s][c]
                tot += float(diff @ diff)
        return tot

    d0 = distortion(pq_fit(embs, m=8, k=16, refine_iters=0))
    d1 = distortion(pq_fit(embs, m=8, k=16, refine_iters=1))
    assert d1 <= d0 * (1 + 1e-9)
    assert d1 < d0  # h60 seeds are raw corpus vectors; one step must improve


def _clustered_corpus(spark, n_clusters=10, per=40, dim=64, noise=0.15, seed=11):
    """Unit-normalized clustered corpus — the regime real embedding
    models produce and the one PQ is built for (the shipped test corpus
    is isotropic: max off-diagonal cosine 0.48 at sf0.001, the
    documented ANN worst case)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    C = rng.normal(0, 1, (n_clusters, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = C[c] + rng.normal(0, noise, dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")


def test_pq_topk_recovers_planted_near_dups(spark):
    """ADC ranking must put a planted near-duplicate (cos ~0.9999) at
    the top for its twin — near-identical vectors share codes, so the
    approximate dot is maximal."""
    import numpy as np
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.quantize import pq_topk

    rng = np.random.default_rng(5)
    rows = []
    for i in range(0, 60, 2):
        v = rng.normal(0, 1, 64)
        v /= np.linalg.norm(v)
        w = v + rng.normal(0, 0.005, 64)
        w /= np.linalg.norm(w)
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter(F.col("vec_id").isin(0, 1, 10, 11))
    got = pq_topk(df, q, k=3, m=8, n_codes=16)
    top = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    for a, b in [(0, 1), (1, 0), (10, 11), (11, 10)]:
        assert (a, b) in top, f"planted twin {b} not in top-3 of {a}"


def test_pq_topk_recall_on_clustered_corpus(spark):
    """PQ-ADC on a clustered corpus (PQ's design regime). Quantization
    to m·log2(k) = 32 bits cannot fine-rank WITHIN a cluster (members
    share codes — that is the compression working), so the right gates
    are (a) cluster precision: top-5 neighbors come from the query's
    true cluster (measured 0.96; random would be 0.1), and (b) a floor
    on exact top-5 recall well above random's ~0.0125 (measured 0.32)."""
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.quantize import pq_topk
    from orientdb_spark.pipeline.similarity import brute_force_topk

    df = _clustered_corpus(spark)
    q = df.filter(F.col("vec_id") % 40 == 0)  # one query per cluster
    approx_df = pq_topk(df, q, k=5, m=8, n_codes=16)
    labeled = approx_df.join(
        df.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    ).collect()
    prec = sum(1 for r in labeled if r["label"] == r["query_id"] // 40) / len(labeled)
    assert prec >= 0.8, f"PQ-ADC cluster precision too low: {prec:.2f}"
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, q, k=5).collect()
    }
    approx = {(r["query_id"], r["neighbor_id"]) for r in labeled}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"PQ-ADC exact recall implausibly low: {recall:.2f}"


def test_pq_validation_errors(spark):
    import pytest as _pytest

    from orientdb_spark.pipeline.quantize import pq_fit

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with _pytest.raises(ValueError, match="not divisible"):
        pq_fit(embs, m=7, k=4)
    with _pytest.raises(ValueError, match="need m"):
        pq_fit(embs, m=0, k=4)


def test_pq_topk_precomputed_codes_path(spark):
    """Build-once/query-many: passing codebooks + codes must produce the
    identical ranking with no encode at query time."""
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.quantize import pq_encode, pq_fit, pq_topk

    df = _clustered_corpus(spark, n_clusters=4, per=20)
    books = pq_fit(df, m=8, k=16)
    codes = pq_encode(df, books)
    q = df.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, pq_topk(df, q, k=3, codebooks=books).collect()))
    b = sorted(map(tuple, pq_topk(df, q, k=3, codebooks=books, codes=codes).collect()))
    assert a == b


def test_ivfpq_full_probe_equals_pq(spark):
    """With nprobe = n_cells (no pruning) IVF-PQ must reproduce plain
    PQ-ADC exactly — same candidates, same LUT scores, same ranks."""
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.quantize import pq_encode, pq_fit, pq_topk
    from orientdb_spark.pipeline.similarity import IvfIndex, ivfpq_topk

    df = _clustered_corpus(spark, n_clusters=4, per=20)
    books = pq_fit(df, m=8, k=16)
    codes = pq_encode(df, books)
    idx = IvfIndex.build(df, n_cells=4)
    q = df.filter(F.col("vec_id") < 3)
    full = sorted(map(tuple, ivfpq_topk(
        df, q, k=3, index=idx, nprobe=4, codebooks=books, codes=codes
    ).collect()))
    plain = sorted(map(tuple, pq_topk(
        df, q, k=3, codebooks=books, codes=codes
    ).collect()))
    assert full == plain


def test_ivfpq_cluster_precision(spark):
    """Pruned IVF-PQ keeps the cluster-precision contract: probing the
    closest cells should RAISE precision vs full-corpus ADC (the pruned
    cells are where the wrong-cluster false positives live)."""
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.similarity import ivfpq_topk

    df = _clustered_corpus(spark)
    q = df.filter(F.col("vec_id") % 40 == 0)
    out = ivfpq_topk(df, q, k=5, n_cells=16, nprobe=4, m=8, n_codes=16)
    labeled = out.join(
        df.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id"
    ).collect()
    assert labeled, "IVF-PQ returned nothing"
    prec = sum(1 for r in labeled if r["label"] == r["query_id"] // 40) / len(labeled)
    assert prec >= 0.8, f"IVF-PQ cluster precision too low: {prec:.2f}"


def test_ivfpq_residual_encoding_more_accurate(spark):
    """Faithful IVFADC: residual encoding (x - c_cell) must estimate
    dot products more accurately than raw-vector encoding at the same
    code budget — residual magnitudes are smaller, so the codebook
    quantizes them more finely. Also pins the q·c + ADC(q, r)
    decomposition against the exact dot."""
    import numpy as np
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.similarity import IvfIndex, ivfpq_topk

    df = _clustered_corpus(spark)
    idx = IvfIndex.build(df, n_cells=10)
    q = df.filter(F.col("vec_id") % 40 == 0)
    X = {r["vec_id"]: np.asarray(r["embedding"]) for r in df.collect()}

    def mean_abs_err(residual):
        out = ivfpq_topk(
            df, q, k=5, index=idx, nprobe=10, m=8, n_codes=16, residual=residual
        ).collect()
        errs = [
            abs(r["score"] - float(X[r["query_id"]] @ X[r["neighbor_id"]]))
            for r in out
        ]
        assert errs
        return sum(errs) / len(errs)

    raw_err = mean_abs_err(False)
    res_err = mean_abs_err(True)
    assert res_err < raw_err, f"residual {res_err:.4f} vs raw {raw_err:.4f}"
    # residual estimates should be genuinely tight on top-ranked pairs
    assert res_err < 0.1, f"residual ADC error too large: {res_err:.4f}"


def _exact_reconstruction_corpus(spark, n=16, dim=64, seed=23):
    """Unit-norm corpus of exactly n distinct vectors: with
    pq_fit(k=n, refine_iters=0) the h60 seeds are ALL corpus vectors,
    so every subspace slice is a codeword and PQ reconstruction is
    exact — the regime where the l2 and dot ADC orderings provably
    coincide on unit-norm data (||q − x̂||² = 2 − 2·q·x̂ when x̂ = x)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, (n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )


def test_pq_l2_dot_orderings_coincide_exact_reconstruction(spark):
    """The docstring claim, scoped correctly: on a unit-norm corpus with
    EXACT PQ reconstruction (codes cover the corpus), metric='l2' and
    metric='dot' produce the identical ranking, and both scores equal
    the exact pairwise values (squared L2 / dot) to the 6-dp round."""
    import numpy as np
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.quantize import pq_topk

    df = _exact_reconstruction_corpus(spark)
    X = {r["vec_id"]: np.asarray(r["embedding"]) for r in df.collect()}
    q = df.filter(F.col("vec_id") < 4)
    dot = pq_topk(df, q, k=5, m=8, n_codes=16, refine_iters=0, metric="dot")
    l2 = pq_topk(df, q, k=5, m=8, n_codes=16, refine_iters=0, metric="l2")
    dot_rows = {(r["query_id"], r["rank"]): r for r in dot.collect()}
    l2_rows = {(r["query_id"], r["rank"]): r for r in l2.collect()}
    assert dot_rows.keys() == l2_rows.keys() and len(dot_rows) == 4 * 5
    for key, dr in dot_rows.items():
        lr = l2_rows[key]
        # identical ordering: same neighbor at every (query, rank)
        assert lr["neighbor_id"] == dr["neighbor_id"], (key, dr, lr)
        qv, nv = X[dr["query_id"]], X[dr["neighbor_id"]]
        # exact reconstruction: ADC scores equal the true pairwise values
        assert abs(dr["score"] - float(qv @ nv)) < 2e-6, (key, dr)
        d = qv - nv
        assert abs(lr["score"] - float(d @ d)) < 2e-6, (key, lr)
        # and the unit-norm identity ties the two scores together
        assert abs(lr["score"] - (2.0 - 2.0 * dr["score"])) < 4e-6, (key, dr, lr)


def test_pq_l2_scores_ascend_with_true_distance(spark):
    """l2 metric monotonicity on the exact-reconstruction fixture: the
    returned ranks must ascend with the TRUE squared distance (rank 1 =
    nearest), i.e. the ascending-order branch orders correctly."""
    import numpy as np
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.quantize import pq_topk

    df = _exact_reconstruction_corpus(spark)
    X = {r["vec_id"]: np.asarray(r["embedding"]) for r in df.collect()}
    q = df.filter(F.col("vec_id") < 4)
    out = pq_topk(df, q, k=15, m=8, n_codes=16, refine_iters=0, metric="l2")
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid, rows in by_q.items():
        got = [n for _, n in sorted(rows)]
        d = {n: float((X[qid] - X[n]) @ (X[qid] - X[n])) for n in X if n != qid}
        want = sorted(d, key=lambda n: (round(d[n], 5), n))
        # compare true-distance order allowing 6-dp score ties to swap
        got_d = [round(d[n], 4) for n in got]
        assert got_d == sorted(got_d), (qid, got, want)


def test_ood_audit_flags_planted_outlier(spark):
    """A vector pointing away from its class's tight cluster must flag
    as OOD; the in-cluster mass must not; per-label quantile cutoffs
    are independent."""
    import pytest

    from orientdb_spark.pipeline.similarity import ood_audit

    rows = []
    # label 0: 19 vectors near +e0, one planted outlier near -e0
    for i in range(19):
        rows.append((i, 0, [1.0, 0.01 * i, 0.0, 0.0]))
    rows.append((19, 0, [-1.0, 0.0, 0.0, 0.0]))
    # label 1: a tight cluster on e1
    for i in range(10):
        rows.append((100 + i, 1, [0.0, 1.0, 0.01 * i, 0.0]))
    embs = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    got = {r["vec_id"]: r.asDict() for r in ood_audit(embs, q=0.05).collect()}
    assert got[19]["is_ood"]                     # the planted outlier
    flagged0 = [v for v in got.values() if v["label"] == 0 and v["is_ood"]]
    assert [f["vec_id"] for f in flagged0] == [19]
    assert all(0 <= v["cos_to_centroid"] <= 1 or v["vec_id"] == 19
               for v in got.values())
    with pytest.raises(ValueError, match="q must be"):
        ood_audit(embs, q=0.0)
