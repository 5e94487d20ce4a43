"""Data-contract validation: expectations, functional dependencies,
order-insensitive digests (sf0.001 oracle comparison in test_entry.py)."""

import pytest
from pyspark.sql import functions as F

from orientdb_spark.quality import fd_violations, table_digest, validate_expectations


def test_expectations_detect_each_violation_kind(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 50.0), (2, None, -1.0), (4, "z", None)],
        "k INT, s STRING, v DOUBLE",
    )
    got = {
        r["rule"]: (r["passed"], r["n_violations"])
        for r in validate_expectations(
            df,
            [
                {"kind": "not_null", "col": "s"},
                {"kind": "unique", "col": "k"},
                {"kind": "in_range", "col": "v", "lo": 0, "hi": 10},
                {"kind": "accepted_values", "col": "s", "values": ["a"]},
            ],
        ).collect()
    }
    assert got["not_null(s)"] == (False, 1)
    assert got["unique(k)"] == (False, 1)          # k=2 twice
    # v: 50 out of range, -1 out of range, NULL violates (range implies presence)
    assert got["in_range(v,0,10)"] == (False, 3)
    assert got["accepted_values(s)"] == (False, 2)  # "z" and NULL
    with pytest.raises(ValueError):
        validate_expectations(df, [])
    with pytest.raises(ValueError):
        validate_expectations(df, [{"kind": "not_null", "col": "nope"}])
    with pytest.raises(ValueError):
        validate_expectations(df, [{"kind": "martian", "col": "k"}])


def test_expectations_single_pass_plan(spark):
    """Ten rules must still cost one scan of the table (one aggregate,
    no union of per-rule jobs)."""
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    rules = [
        {"kind": "in_range", "col": "o_totalprice", "lo": i, "hi": 1e9}
        for i in range(10)
    ]
    out = validate_expectations(df, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan


def test_fd_violations_semantics(spark):
    """a->b holds except for the key mapping to two values; nulls count
    as a distinct value."""
    df = spark.createDataFrame(
        [("x", 1), ("x", 1), ("y", 1), ("y", 2), ("z", None), ("z", 3)],
        "a STRING, b INT",
    )
    got = {r["a"]: r["n_rhs_values"] for r in fd_violations(df, "a", "b").collect()}
    assert got == {"y": 2, "z": 2}
    with pytest.raises(ValueError):
        fd_violations(df, "a", "nope")


def test_table_digest_invariances(spark):
    """Same multiset of rows -> same digest under reorder/repartition;
    any changed, added, or removed row changes it; the pipe escape
    keeps ('a|b') and ('a','b') rows distinct."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k INT, s STRING"
    )
    d = table_digest(df).collect()[0]
    d2 = table_digest(df.orderBy(F.desc("k")).repartition(5)).collect()[0]
    assert (d["n_rows"], d["digest"]) == (d2["n_rows"], d2["digest"])
    changed = table_digest(
        df.withColumn("s", F.when(F.col("k") == 1, "A").otherwise(F.col("s")))
    ).collect()[0]
    assert changed["digest"] != d["digest"]
    dropped = table_digest(df.filter(F.col("k") != 2)).collect()[0]
    assert dropped["digest"] != d["digest"]
    tricky_a = spark.createDataFrame([("a|b", "c")], "x STRING, y STRING")
    tricky_b = spark.createDataFrame([("a", "b|c")], "x STRING, y STRING")
    assert (
        table_digest(tricky_a).collect()[0]["digest"]
        != table_digest(tricky_b).collect()[0]["digest"]
    )
    with pytest.raises(ValueError):
        table_digest(df, ["nope"])


def test_not_null_when_conditional_rule(spark):
    """The cross-column conditional: c required only where the guard
    matches; null guards are exempt; still one aggregate pass."""
    df = spark.createDataFrame(
        [
            ("shipped", "2024-01-01"),
            ("shipped", None),          # violation
            ("pending", None),          # exempt
            (None, None),               # null guard exempt
        ],
        "status STRING, ship_date STRING",
    )
    rule = {
        "kind": "not_null_when", "col": "ship_date",
        "when_col": "status", "when_value": "shipped",
    }
    r = validate_expectations(df, [rule]).collect()[0]
    assert r["rule"] == "not_null_when(ship_date,status=shipped)"
    assert (r["passed"], r["n_violations"]) == (False, 1)
    with pytest.raises(ValueError):
        validate_expectations(
            df, [{"kind": "not_null_when", "col": "ship_date",
                  "when_col": "nope", "when_value": 1}]
        )


def test_expectations_empty_table_is_vacuous_pass(spark):
    """r6 ADVICE: on a zero-row table every rule must report
    passed=true, n_violations=0 — not NULL/NULL from F.sum over no
    rows. The empty-snapshot case is exactly what promotion gates
    exist to catch."""
    df = spark.createDataFrame([], "a INT, b STRING")
    out = validate_expectations(
        df,
        [
            {"kind": "not_null", "col": "a"},
            {"kind": "unique", "col": "a"},
            {"kind": "in_range", "col": "a", "lo": 0, "hi": 10},
            {"kind": "accepted_values", "col": "b", "values": ["x"]},
            {"kind": "not_null_when", "col": "a", "when_col": "b", "when_value": "x"},
        ],
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r["passed"] is True and r["n_violations"] == 0, r


def test_table_digest_escape_injective(spark):
    """r6 ADVICE: a literal string value '\\N' must not hash equal to
    NULL, and trailing-backslash values must stay distinct from their
    separator-adjacent twins (backslash escaped before pipe)."""
    lit_backslash_n = spark.createDataFrame([("\\N",)], "x STRING")
    real_null = spark.createDataFrame([(None,)], "x STRING")
    assert (
        table_digest(lit_backslash_n).collect()[0]["digest"]
        != table_digest(real_null).collect()[0]["digest"]
    )
    # ('a\', 'b') vs ('a', '\b'): without backslash-doubling both
    # canonicalize to a\|b
    t1 = spark.createDataFrame([("a\\", "b")], "x STRING, y STRING")
    t2 = spark.createDataFrame([("a", "\\b")], "x STRING, y STRING")
    assert (
        table_digest(t1).collect()[0]["digest"]
        != table_digest(t2).collect()[0]["digest"]
    )
    # ('a\', 'b') vs ('a\|b') one-column-ish collision via escaped pipe
    t3 = spark.createDataFrame([("a\\|b", "c")], "x STRING, y STRING")
    t4 = spark.createDataFrame([("a\\", "b|c")], "x STRING, y STRING")
    assert (
        table_digest(t3).collect()[0]["digest"]
        != table_digest(t4).collect()[0]["digest"]
    )
