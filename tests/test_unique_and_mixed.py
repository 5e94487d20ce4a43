"""UNIQUE property-index enforcement on write + schema-mixed overflow
fields (reference: OProperty index types :257 / IndexTest duplicate-save
failure; ODocument.java:55-57 per-record undeclared fields)."""

from __future__ import annotations

import pytest

from orientdb_spark import Engine
from orientdb_spark.errors import OIndexException


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def _mk_unique_class(eng):
    eng.command("create class u1")
    eng.command("create property u1.code string")
    eng.command("create property u1.v long")
    eng.command("create index u1.code unique")
    eng.command("insert into u1 (code, v) values ('A', 1)")
    eng.command("insert into u1 (code, v) values ('B', 2)")


def test_insert_duplicate_unique_raises(eng):
    _mk_unique_class(eng)
    with pytest.raises(OIndexException, match="duplicated key"):
        eng.command("insert into u1 (code, v) values ('A', 3)")
    # table unchanged
    assert eng.table("u1").count() == 2


def test_update_into_duplicate_raises(eng):
    _mk_unique_class(eng)
    with pytest.raises(OIndexException):
        eng.command("update u1 set code = 'A' where v = 2")


def test_update_keeping_unique_ok(eng):
    _mk_unique_class(eng)
    eng.command("update u1 set code = 'C' where v = 2")
    rows = sorted(r.code for r in eng.table("u1").collect())
    assert rows == ["A", "C"]


def test_create_unique_index_over_duplicates_raises(eng):
    eng.command("create class u2")
    eng.command("insert into u2 (k) values (7)")
    eng.command("insert into u2 (k) values (7)")
    with pytest.raises(OIndexException):
        eng.command("create index u2.k unique")
    # failed build must not leave the index behind
    assert eng.catalog.get("u2").properties["k"].index_type is None


def test_nulls_exempt_from_unique(eng):
    _mk_unique_class(eng)
    eng.command("insert into u1 (code, v) values (null, 10)")
    eng.command("insert into u1 (code, v) values (null, 11)")
    assert eng.table("u1").count() == 4


def test_schema_mixed_overflow_roundtrip(eng):
    eng.command("create class m1")
    eng.command("create property m1.name string")
    eng.command("insert into m1 (name) values ('plain')")
    eng.command("insert into m1 (name, nickname, age) values ('rich', 'Rico', 33)")
    rows = {
        r.name: (r.nickname, r.age_n)
        for r in eng.sql(
            "select name, nickname, age.asinteger() as age_n from m1"
        ).collect()
    }
    assert rows == {"plain": (None, None), "rich": ("Rico", 33)}
    # declared schema untouched: _extra is storage, not a user field
    assert "_extra" not in [
        f for f in eng.sql("select @fields as f from m1 limit 1").first()["f"]
    ]


def test_schemaless_class_still_widens(eng):
    # a class with NO declared properties keeps full schema-less widening
    eng.command("create class free")
    eng.command("insert into free (a) values (1)")
    eng.command("insert into free (a, b) values (2, 'x')")
    df = eng.table("free")
    assert set(df.columns) >= {"a", "b"}
    assert "_extra" not in df.columns
