"""Database-from-scratch scenario — the reference's ordered TestNG suite
(tests:database/auto/local-test-db-from-scratch.xml: DbCreation → Schema →
Population → Tx → Index → Dictionary → Query → JSON → Graph → DbTools)
replayed as one stateful flow against a single engine.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from orientdb_spark import Engine
from orientdb_spark.errors import OValidationException


@pytest.fixture(scope="module")
def db(spark):
    return Engine(spark)


def test_01_schema(db):
    db.command("create class Profile")
    db.command("create property Profile.nick string")
    db.command("create property Profile.followers integer")
    db.command("create class PremiumProfile extends Profile")
    cls = db.catalog.get("PremiumProfile")
    assert cls.super_class == "Profile"
    # constraints (CRUDDocumentValidationTest shape)
    db.catalog.get("Profile").properties["nick"].mandatory = True
    db.catalog.get("Profile").properties["nick"].not_null = True


def test_02_population_crud(db):
    for i, nick in enumerate(["Neo", "Morpheus", "Trinity", "Smith"]):
        db.command(
            f"insert into Profile (nick, followers) values ('{nick}', {i * 100})"
        )
    db.command("insert into PremiumProfile (nick, followers) values ('Oracle', 1000)")
    assert db.query("select count(*) as n from Profile")[0]["n"] == 5  # polymorphic
    with pytest.raises(OValidationException):
        db.command("insert into Profile (nick, followers) values (null, 1)")
    db.command("update Profile set followers = 450 where nick = 'Neo'")
    assert (
        db.query("select followers from Profile where nick = 'Neo'")[0]["followers"] == 450
    )
    db.command("delete from Profile where nick = 'Smith'")
    assert db.query("select count(*) as n from Profile")[0]["n"] == 4


def test_03_transactions(db):
    tx = db.begin()
    tx.command("update Profile set followers = 451 where nick = 'Neo'")
    assert tx.query("select followers from Profile where nick = 'Neo'")[0]["followers"] == 451
    tx.commit()
    assert (
        db.query("select followers from Profile where nick = 'Neo'")[0]["followers"] == 451
    )


def test_04_index_and_query(db):
    db.command("create index Profile.nick fulltext")
    rows = db.query("select nick from Profile where nick containstext 'neo'")
    assert [r["nick"] for r in rows] == ["Neo"]
    # SQL surface: method chains, order, limit
    rows = db.query(
        "select nick.toUpperCase() as up from Profile where followers >= 100 "
        "order by followers desc limit 2"
    )
    assert [r["up"] for r in rows] == ["ORACLE", "NEO"]


def test_05_dictionary(db):
    db.dictionary.put("chosen-one", "Profile", (db.catalog.get("Profile").cluster_id, 0))
    assert db.dictionary.contains_key("chosen-one")
    assert db.dictionary.size() == 1


def test_06_json_and_tools(db):
    from orientdb_spark.tools import roundtrip_identical

    tmp = tempfile.mkdtemp(prefix="ospark_scratch_")
    assert roundtrip_identical(db, "Profile", tmp)


def test_07_graph(db):
    from orientdb_spark.graph import Graph

    spark = db.spark
    profiles = db.table("Profile").select(F.col("nick").alias("vid"))
    follows = spark.createDataFrame(
        [("Neo", "Morpheus", "follows"), ("Trinity", "Neo", "follows")],
        ["src", "dst", "label"],
    )
    g = Graph(profiles, follows)
    reached = g.bfs(spark.createDataFrame([("Trinity",)], ["vid"]), max_depth=2)
    assert {r["vid"] for r in reached.collect()} == {"Trinity", "Neo", "Morpheus"}


def test_08_persistence_roundtrip(db, spark):
    tmp = tempfile.mkdtemp(prefix="ospark_scratch_db_")
    db.save_database(tmp)
    db2 = Engine(spark)
    db2.open_database(tmp)
    assert db2.query("select count(*) as n from Profile")[0]["n"] == 4
    assert db2.catalog.get("PremiumProfile").super_class == "Profile"
    # fulltext index rebuilt on open
    assert [
        r["nick"] for r in db2.query("select nick from Profile where nick containstext 'neo'")
    ] == ["Neo"]
