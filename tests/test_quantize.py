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
