"""WrongQueryTest analog — malformed statements must raise typed engine
errors (never Py4J/Spark internals), mirroring the reference's negative
suite (tests:database/auto/WrongQueryTest + parse-error assertions in
SQLSelectTest:500-512 / SQLFunctionsTest:55-60).
"""

from __future__ import annotations

import pytest

from orientdb_spark.errors import (
    OCommandExecutionException,
    OCommandSQLParsingException,
    OSchemaException,
)

BAD_PARSE = [
    "select from",                         # missing target
    "select where x = 1",                  # missing FROM
    "insert into t values",                # missing value list
    "select * from region where",          # dangling WHERE
    "select a.b( from region",             # unterminated method chain
    "update region",                       # UPDATE without SET
    "select from region order by",         # dangling ORDER BY
    "select from region limit x",          # non-numeric limit
    "select nosuchfunc(1) from region",    # unknown function (OSQLEngine:35-41)
    "select from region where r_name nosuchop 3",  # unknown operator
    "create property region",              # malformed DDL
    "select from [1:2, broken]",           # bad RID list
]


@pytest.mark.parametrize("sql", BAD_PARSE)
def test_bad_statements_raise_parsing_errors(engine, sql):
    with pytest.raises((OCommandSQLParsingException, OCommandExecutionException)):
        engine.query(sql)


def test_unknown_class_raises_schema_error(engine):
    with pytest.raises(OSchemaException):
        engine.query("select from nosuchclass")


def test_unknown_field_returns_null_not_error(engine):
    # reference semantics: undeclared fields read as null, not an error
    rows = engine.query("select r_regionkey, ghost_field from region order by r_regionkey")
    assert all(r["ghost_field"] is None for r in rows)


def test_rid_miss_is_empty_not_error(engine):
    # valid cluster, nonexistent position → empty result
    assert engine.query("select from 1:999999") == []


def test_unknown_cluster_rid_is_error(engine):
    # nonexistent cluster id → execution error (invalid cluster)
    with pytest.raises(OCommandExecutionException):
        engine.query("select from 99:12345")


def test_duplicate_explicit_alias_is_error(engine):
    with pytest.raises(OCommandSQLParsingException):
        engine.query("select r_name as x, r_regionkey as x from region")
