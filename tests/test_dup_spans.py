"""duplicate_spans: exact duplicated-substring span mining.

Reference analog: whole-doc dedup in the 2010 engine has no substring
notion at all — this is the LLM-pipeline extension (Lee et al. 2022
suffix-array substring dedup, re-expressed as a two-exchange n-gram
window plan). Handcrafted edges + a brute-force property check.
"""

from __future__ import annotations

import random

from orientdb_spark.pipeline.dedup import duplicate_spans


def _spans(spark, rows, n=3, min_df=2, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_spans(df, n=n, min_df=min_df, **kw).collect()
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_tokens"]) for r in out
    }


def test_shared_run_marks_both_docs(spark):
    got = _spans(
        spark,
        [(1, "a b c d e f g"), (2, "x y a b c d e z")],
    )
    # shared run "a b c d e": doc1 grams at 1..3 -> span 1..5, doc2 at 3..5 -> 3..7
    assert got == {(1, 1, 5, 5), (2, 3, 7, 5)}


def test_intra_doc_repetition_alone_does_not_fire(spark):
    # gram repeats 4x but only in ONE document: min_df counts distinct docs
    got = _spans(spark, [(1, "q q q q q q"), (2, "totally different words here")])
    assert got == set()


def test_disjoint_runs_yield_two_spans(spark):
    got = _spans(
        spark,
        [(1, "a b c d Z Z Z Z c d e f"), (2, "a b c d Q Q Q Q c d e f")],
    )
    doc1 = {(s, e, t) for (d, s, e, t) in got if d == 1}
    assert doc1 == {(1, 4, 4), (9, 12, 4)}


def test_exact_ngram_span_has_length_n(spark):
    # minimal overlap: exactly one shared gram -> span of exactly n tokens
    got = _spans(spark, [(1, "p q r s t"), (2, "u v q r s w x")])
    assert (1, 2, 4, 3) in got and (2, 3, 5, 3) in got


def test_short_docs_skipped(spark):
    got = _spans(spark, [(1, "a b"), (2, "a b")])
    assert got == set()


def test_fingerprint_path_matches_exact_path(spark):
    rows = [(1, "a b c d e f g"), (2, "x y a b c d e z"), (3, "c d e f g h i")]
    assert _spans(spark, rows) == _spans(spark, rows, fingerprint=True)


def _brute_force(docs: dict[int, list[str]], n: int, min_df: int):
    """Sequential reference: mark positions, merge overlapping runs."""
    gram_docs: dict[tuple, set] = {}
    for d, t in docs.items():
        for i in range(len(t) - n + 1):
            gram_docs.setdefault(tuple(t[i : i + n]), set()).add(d)
    out = set()
    for d, t in docs.items():
        hits = [
            i + 1
            for i in range(len(t) - n + 1)
            if len(gram_docs[tuple(t[i : i + n])]) >= min_df
        ]
        run: list[int] = []
        for p in hits + [None]:
            if run and (p is None or p - run[-1] > n - 1):
                out.add((d, run[0], run[-1] + n - 1, run[-1] + n - 1 - run[0] + 1))
                run = []
            if p is not None:
                run.append(p)
    return out


def test_property_vs_brute_force(spark):
    rng = random.Random(7)
    vocab = list("abcdefgh")
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25))))
        for d in range(14)
    ]
    docs = {d: t.split() for d, t in rows}
    for n in (2, 3, 4):
        assert _spans(spark, rows, n=n) == _brute_force(docs, n, 2), f"n={n}"
