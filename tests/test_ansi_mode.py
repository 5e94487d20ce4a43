"""Session-config robustness: reference comparison semantics must hold even
under ANSI mode (Spark 4's default for externally-built sessions).

The reference's coercion is lenient — a failed string→number parse simply
doesn't match (core:sql/filter/OSQLFilterCondition.java:73-103). Two layers
guarantee that here: Engine.__init__ pins spark.sql.ansi.enabled=false, and
_coerce emits try_cast so the compiled comparisons are lenient even if a
caller flips ANSI back on afterwards (analysis happens at action time under
the then-current conf)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def ansi_on(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", old)


def test_engine_pins_ansi_off(spark):
    from orientdb_spark import Engine

    spark.conf.set("spark.sql.ansi.enabled", "true")
    Engine(spark)
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"


def test_any_wildcard_survives_ansi_on(engine, ansi_on):
    # any() = 1 expands to <col> = 1 over every column incl. strings; under
    # ANSI a plain CAST(n_name AS BIGINT) would throw CAST_INVALID_INPUT
    rows = engine.query("select n_name from nation where any() = 1")
    assert len(rows) > 0
    names = {r.n_name for r in rows}
    # oracle: n_nationkey = 1 OR n_regionkey = 1
    expected = {
        r.n_name
        for r in engine.table("nation")
        .filter((F.col("n_nationkey") == 1) | (F.col("n_regionkey") == 1))
        .collect()
    }
    assert names == expected


def test_string_field_numeric_literal_lenient(engine, ansi_on):
    # direct string-vs-number comparison: no match, no error
    rows = engine.query("select r_name from region where r_name = 7")
    assert rows == []


def test_numeric_field_bad_string_literal_lenient(engine, ansi_on):
    rows = engine.query("select r_name from region where r_regionkey = 'notanumber'")
    assert rows == []


def test_numeric_field_good_string_literal(engine, ansi_on):
    rows = engine.query("select r_name from region where r_regionkey = '1'")
    assert len(rows) == 1
