"""Model-based curation operators (pipeline/model.py +
multimodal.pair_score_filter): distributed logistic-GD training vs a
sequential numpy reference, broadcast-weights inference semantics and
plan shape, CCNet perplexity bucketing, CLIP-score pair filtering.
The sf0.001 oracle comparison runs in test_entry.py's mirror harness."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from orientdb_spark.pipeline import model, multimodal


def _py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_round6(v: float) -> float:
    v = v + 1e-12
    return math.floor(abs(v) * 1e6 + 0.5) / 1e6 * (1.0 if v >= 0 else -1.0)


def _numpy_logistic_gd(rows, d, iters, lr):
    """Sequential reference of train_quality_classifier: same hashed
    L1-normalized features, same 6-dp quantized full-batch GD."""
    feats, ys = [], []
    for text, y in rows:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if not toks:
            continue
        x = np.zeros(d)
        for t in toks:
            x[_py_h60(t) % d] += 1.0
        feats.append(x / len(toks))
        ys.append(float(y))
    X, y = np.array(feats), np.array(ys)
    w, b = np.zeros(d), 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        e = p - y
        w = np.array([_py_round6(w[j] - lr * float(e @ X[:, j]) / len(y)) for j in range(d)])
        b = _py_round6(b - lr * float(e.sum()) / len(y))
    return {-1: b, **{j: float(w[j]) for j in range(d)}}


@pytest.fixture(scope="module")
def labeled_docs(spark):
    rows = [
        (i, f"good clean prose sample number {i} with helpful words", 1)
        for i in range(20)
    ] + [
        (100 + i, f"spam spam junk noise garbage {i} zz xx qq", 0)
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, y INT")


def test_train_matches_numpy_reference(spark, labeled_docs):
    """The distributed trainer and the sequential numpy GD land on the
    SAME 6-dp weight grid — the quantized-update contract that also
    makes the driver oracle's SQL replay exact."""
    got = model.train_quality_classifier(
        labeled_docs, "y", n_buckets=16, iters=3, lr=1.0
    )
    rows = [(r["text"], r["y"]) for r in labeled_docs.collect()]
    want = _numpy_logistic_gd(rows, d=16, iters=3, lr=1.0)
    assert got == want


def test_train_learns_separable_labels(spark, labeled_docs):
    """On a separable corpus the trained model must order every
    positive doc above every negative one."""
    w = model.train_quality_classifier(
        labeled_docs, "y", n_buckets=32, iters=10, lr=4.0
    )
    scored = {
        r["doc_id"]: r["score"]
        for r in model.classifier_score(labeled_docs, w).collect()
    }
    pos = [scored[i] for i in range(20)]
    neg = [scored[100 + i] for i in range(20)]
    assert min(pos) > max(neg)


def test_train_validation_errors(spark, labeled_docs):
    with pytest.raises(ValueError):
        model.train_quality_classifier(labeled_docs, "y", n_buckets=1)
    with pytest.raises(ValueError):
        model.train_quality_classifier(labeled_docs, "y", n_buckets=2048)
    with pytest.raises(ValueError):
        model.train_quality_classifier(labeled_docs, "y", iters=0)
    with pytest.raises(ValueError):
        model.train_quality_classifier(labeled_docs, "y", lr=0.0)
    empty = spark.createDataFrame(
        [(1, "   ", 1)], "doc_id LONG, text STRING, y INT"
    )
    with pytest.raises(ValueError, match="no documents"):
        model.train_quality_classifier(empty, "y")


def test_score_threshold_and_zero_token_exclusion(spark):
    """threshold keeps rows whose ROUNDED score clears it; docs with no
    tokens produce no rows (no features — same exclusion as training)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "")],
        "doc_id LONG, text STRING",
    )
    # hand-built model: every bucket weight 0, intercept 0 -> sigmoid(0)=0.5
    w = {-1: 0.0, **{j: 0.0 for j in range(8)}}
    out = model.classifier_score(docs, w).collect()
    assert {r["doc_id"]: r["score"] for r in out} == {1: 0.5, 2: 0.5}
    kept = model.classifier_score(docs, w, threshold=0.500001).collect()
    assert kept == []
    kept = model.classifier_score(docs, w, threshold=0.5)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}


def test_score_validation_errors(spark, labeled_docs):
    with pytest.raises(ValueError, match="intercept"):
        model.classifier_score(labeled_docs, {0: 1.0})
    with pytest.raises(ValueError, match="at least one feature"):
        model.classifier_score(labeled_docs, {-1: 0.0})


def test_train_and_score_matches_two_pass_composition(spark, labeled_docs):
    """The r14 shared-tokenize composition must reproduce the two-pass
    train -> classifier_score pipeline exactly: same weights (the
    feature counts are byte-identical integers), same 6-dp scores (the
    per-token score formula is unchanged; only the scan it reads from
    is shared)."""
    w = model.train_quality_classifier(
        labeled_docs, "y", n_buckets=16, iters=3, lr=1.0
    )
    two = {
        r["doc_id"]: r["score"]
        for r in model.classifier_score(labeled_docs, w).collect()
    }
    one = {
        r["doc_id"]: r["score"]
        for r in model.train_and_score_quality_classifier(
            labeled_docs, "y", n_buckets=16, iters=3, lr=1.0
        ).collect()
    }
    assert one == two and len(one) == 40


def test_score_plan_single_exchange(spark, labeled_docs):
    """The inference pass is scan -> in-row hash/lookup -> one
    map-side-combinable groupBy: exactly one Exchange, no Join."""
    w = {-1: 0.1, **{j: 0.01 * j for j in range(16)}}
    plan = (
        model.classifier_score(labeled_docs, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_perplexity_buckets_terciles(spark):
    """Per-language tercile split: 9 docs with distinct NLLs per lang
    land 3/3/3; the lang with identical scores lands all-head (nll ==
    both thresholds)."""
    # lang a: doc i mixes (10 - i) corpus-common "a b" bigrams with i
    # doc-unique words, so NLL rises monotonically with i;
    # lang b: three identical docs -> identical NLL.
    rows = [(i, "a b " * (10 - i) + " ".join(f"r{i}x{j}" for j in range(i)), "a")
            for i in range(9)]
    rows += [(100 + i, "same text every time", "b") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = model.perplexity_buckets(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["bucket"])
    a = sorted(by_lang["a"])
    assert a.count("head") == 3 and a.count("middle") == 3 and a.count("tail") == 3
    assert by_lang["b"] == ["head", "head", "head"]


def test_perplexity_buckets_excludes_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one", "a"), (2, "two words here", "a"), (3, "more words here", "a")],
        "doc_id LONG, text STRING, lang STRING",
    )
    got = {r["doc_id"] for r in model.perplexity_buckets(docs).collect()}
    assert got == {2, 3}  # doc 1 has no bigram
    with pytest.raises(ValueError):
        model.perplexity_buckets(docs, lo=0.7, hi=0.3)
    with pytest.raises(ValueError):
        model.perplexity_buckets(docs, lo=0.0)


def test_pair_score_filter_semantics(spark):
    """Identical vectors score 1.0 and survive; opposite vectors score
    -1.0 and drop at τ=0; zero-norm sides drop EXPLICITLY (not via NaN
    ordering, which would silently keep them)."""
    left = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 0.0]), (4, [1.0, 1.0])],
        "pair_id LONG, embedding ARRAY<DOUBLE>",
    )
    right = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0]), (3, [1.0, 0.0]), (4, [0.0, 0.0])],
        "pair_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = {r["pair_id"]: r["pair_score"]
           for r in multimodal.pair_score_filter(left, right, threshold=0.0).collect()}
    assert out == {1: 1.0}  # 2 fails τ, 3 and 4 are zero-norm
    out2 = {r["pair_id"]
            for r in multimodal.pair_score_filter(left, right, threshold=-1.0).collect()}
    assert out2 == {1, 2}


def test_pair_score_filter_threshold_boundary(spark):
    """The compare happens on the ROUNDED score: a cosine a hair under
    τ that rounds UP to τ is kept — the documented grid contract."""
    eps = 2e-8  # cos ≈ 0.99999998.. rounds to 1.0 at 6 dp
    left = spark.createDataFrame(
        [(1, [1.0, 0.0])], "pair_id LONG, embedding ARRAY<DOUBLE>"
    )
    right = spark.createDataFrame(
        [(1, [1.0, eps])], "pair_id LONG, embedding ARRAY<DOUBLE>"
    )
    out = multimodal.pair_score_filter(left, right, threshold=1.0).collect()
    assert [r["pair_score"] for r in out] == [1.0]


def _strip_approx_pctl(plan: str) -> str:
    return plan.replace("percentile_approx(", "").replace("approx_percentile(", "")


def test_perplexity_buckets_approx_removes_exact_percentile(spark):
    """approx=True must swap the single-reducer exact F.percentile for
    the mergeable percentile_approx sketch in the threshold stage (the
    profile_columns approx precedent, r11 verdict item 4)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = model.perplexity_buckets(docs)
    approx = model.perplexity_buckets(docs, approx=True)
    p_exact = exact._jdf.queryExecution().optimizedPlan().toString()
    p_approx = approx._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile(" in _strip_approx_pctl(p_exact)
    assert "percentile(" not in _strip_approx_pctl(p_approx)
    assert "percentile_approx(" in p_approx
    # the sketch path still buckets every scored doc into the 3 buckets
    out = approx.collect()
    assert len(out) == exact.count()
    assert {r["bucket"] for r in out} <= {"head", "middle", "tail"}


# --- score calibration / threshold-tuning table -----------------------------


def test_score_calibration_known_values(spark):
    rows = [
        # (score, label): bin 0 = [0, .25), ... bin 3 = [.75, 1] at n_bins=4
        (0.1, 0), (0.2, 0), (0.3, 0), (0.4, 1),
        (0.6, 1), (0.7, 0), (0.9, 1), (0.95, 1),
    ]
    df = spark.createDataFrame(rows, "score DOUBLE, label INT")
    out = {r["bin"]: r for r in model.score_calibration(df, n_bins=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["n"] == 2 and out[0]["n_pos"] == 0
    assert out[1]["n"] == 2 and out[1]["n_pos"] == 1
    assert out[3]["n"] == 2 and out[3]["n_pos"] == 2
    # cumulative from the top: bin 3 alone -> P=1, R=2/4
    assert out[3]["precision_at"] == 1.0 and out[3]["recall_at"] == 0.5
    # whole corpus at bin 0 -> P = 4/8, R = 1
    assert out[0]["precision_at"] == 0.5 and out[0]["recall_at"] == 1.0
    assert out[1]["pos_rate"] == 0.5


def test_score_calibration_range_binning_spreads_concentrated_scores(spark):
    rows = [(0.4590 + i * 0.0001, i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, "score DOUBLE, label INT")
    unit = model.score_calibration(df, n_bins=10).collect()
    rng = model.score_calibration(df, n_bins=10, binning="range").collect()
    assert len(unit) == 1          # all scores in unit bin 4
    assert len(rng) == 10          # observed-range deciles spread them
    assert sum(r["n"] for r in rng) == 20
    with pytest.raises(ValueError, match="binning"):
        model.score_calibration(df, binning="ntile")
    with pytest.raises(ValueError, match="n_bins"):
        model.score_calibration(df, n_bins=1)


def test_score_calibration_constant_scores_single_bin(spark):
    df = spark.createDataFrame([(0.5, 1), (0.5, 0)], "score DOUBLE, label INT")
    out = model.score_calibration(df, n_bins=10, binning="range").collect()
    assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n"] == 2


def test_threshold_sweep_hand_checked(spark):
    """Confusion counts and one-division metrics at hand-computable
    thresholds; NULL precision when nothing is predicted positive;
    f1 via the integer form."""
    import pytest

    from orientdb_spark.pipeline.model import threshold_sweep

    scored = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.6, 1), (0.4, 1), (0.2, 0)],
        "score double, label int",
    )
    got = {
        r["threshold"]: r.asDict()
        for r in threshold_sweep(
            scored, thresholds=(0.5, 0.7, 0.95)
        ).collect()
    }
    t5 = got[0.5]
    assert (t5["tp"], t5["fp"], t5["fn"], t5["tn"]) == (2, 1, 1, 1)
    assert t5["precision"] == round(2 / 3 + 1e-12, 6)
    assert t5["recall"] == round(2 / 3 + 1e-12, 6)
    assert t5["f1"] == round(4 / 6 + 1e-12, 6)
    assert t5["accuracy"] == 0.6
    t7 = got[0.7]
    assert (t7["tp"], t7["fp"]) == (1, 1) and t7["precision"] == 0.5
    t95 = got[0.95]
    assert t95["tp"] == 0 and t95["fp"] == 0
    assert t95["precision"] is None and t95["recall"] == 0.0
    with pytest.raises(ValueError, match="at least one threshold"):
        threshold_sweep(scored, thresholds=())
