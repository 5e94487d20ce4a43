"""Hooks (ORecordHook analog) + native query API (OQueryContextNative).

Reference tests mirrored: tests:database/auto/HookTest.java (invocation
counting per CRUD event) and the native-query runner usage in
core:query/nativ/ONativeSynchQuery.java.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_spark import Engine
from orientdb_spark.native import ONativeAsynchQuery, ONativeSynchQuery, OQueryContextNative

from tests.conftest import SF_DIR


def _fresh(spark):
    eng = Engine(spark)
    eng.register_parquet_dir(SF_DIR)
    return eng


def test_hooks_fire_per_crud_statement(spark):
    eng = _fresh(spark)
    eng.register_dataframe("hooked", spark.read.parquet(f"{SF_DIR}/region.parquet"))
    events = []
    eng.hooks.register(lambda ev, cls, d: events.append((ev, cls)))

    eng.command("insert into hooked (r_regionkey, r_name) values (99, 'X')")
    eng.command("update hooked set r_name = 'Y' where r_regionkey = 99")
    eng.command("delete from hooked where r_regionkey = 99")

    assert events == [
        ("before_create", "hooked"),
        ("after_create", "hooked"),
        ("before_update", "hooked"),
        ("after_update", "hooked"),
        ("before_delete", "hooked"),
        ("after_delete", "hooked"),
    ]


def test_hook_after_detail_carries_counts(spark):
    eng = _fresh(spark)
    eng.register_dataframe("hooked2", spark.read.parquet(f"{SF_DIR}/region.parquet"))
    details = {}
    eng.hooks.register(lambda ev, cls, d: details.update({ev: d}) if d else None)
    eng.command("update hooked2 set r_name = 'Z' where r_regionkey <= 1")
    assert details["after_update"] == {"updated": 2}


def test_fulltext_index_maintained_by_hook(spark):
    eng = _fresh(spark)
    eng.register_dataframe(
        "ftdocs",
        spark.createDataFrame([(1, "spark engine"), (2, "plain words")], ["doc_id", "text"]),
        rid_pos=lambda df: F.col("doc_id"),
    )
    eng.command("create index ftdocs.text fulltext")
    from orientdb_spark.fulltext import containstext_semijoin

    assert containstext_semijoin(eng, "ftdocs", "text", "spark").count() == 1
    eng.command("insert into ftdocs (doc_id, text) values (3, 'more spark text')")
    # hook rebuilt the inverted index — the new row is findable
    assert containstext_semijoin(eng, "ftdocs", "text", "spark").count() == 2


def test_native_synch_query_matches_dataframe_filter(engine):
    ctx = (
        OQueryContextNative()
        .field("c_name")
        .like("Customer#%1")
        .and_()
        .field("c_acctbal")
        .major(5000)
    )
    rows = ONativeSynchQuery(engine, "customer", ctx).execute()
    expected = (
        engine.table("customer")
        .filter(F.col("c_name").like("Customer#%1") & (F.col("c_acctbal") > 5000))
        .count()
    )
    assert len(rows) == expected > 0


def test_native_query_not_between_casts(engine):
    ctx = (
        OQueryContextNative()
        .field("n_nationkey")
        .to_long()
        .between(3, 7)
        .and_()
        .not_()
        .field("n_name")
        .eq("NATION_5")
    )
    rows = ONativeSynchQuery(engine, "nation", ctx).execute()
    keys = sorted(r["n_nationkey"] for r in rows)
    assert keys == [3, 4, 6, 7]


def test_native_asynch_listener_abort(engine):
    ctx = OQueryContextNative().field("o_orderkey").minor_eq(100)
    seen = []

    def listener(row):
        seen.append(row)
        return len(seen) < 5

    ONativeAsynchQuery(engine, "orders", ctx).execute(listener)
    assert len(seen) == 5


def test_version_bumps_on_update(spark):
    eng = _fresh(spark)
    eng.register_dataframe(
        "vtest",
        spark.read.parquet(f"{SF_DIR}/region.parquet"),
        rid_pos=lambda df: F.col("r_regionkey"),
    )
    eng.command("update vtest set r_name = 'A' where r_regionkey <= 1")
    eng.command("update vtest set r_name = 'B' where r_regionkey = 0")
    rows = {
        r["r_regionkey"]: r["ver"]
        for r in eng.query("select @version as ver, r_regionkey from vtest")
    }
    assert rows[0] == 2 and rows[1] == 1 and rows[2] == 0
    # __version backing column never leaks into SELECT *
    assert "__version" not in eng.sql("select from vtest").columns


def test_containstext_auto_uses_fulltext_index(spark):
    eng = _fresh(spark)
    eng.register_dataframe(
        "ftauto",
        spark.createDataFrame(
            [(1, "spark engine"), (2, "sparkly things"), (3, "plain words")],
            ["doc_id", "text"],
        ),
        rid_pos=lambda df: F.col("doc_id"),
    )
    sql = "select doc_id from ftauto where text containstext 'spark' order by doc_id"
    # no index: substring-containment fallback matches 'sparkly' too
    assert [r["doc_id"] for r in eng.query(sql)] == [1, 2]
    eng.command("create index ftauto.text fulltext")
    # indexed: token-match semantics via the inverted-index semijoin
    # (searchForIndexes access-path parity), and the plan shows the join
    df = eng.sql(sql)
    assert [r["doc_id"] for r in df.collect()] == [1]
    assert "LeftSemi" in df._jdf.queryExecution().optimizedPlan().toString()


def test_phrase_search_consecutive_and_stopword_semantics(spark):
    from orientdb_spark.fulltext import phrase_search, positional_index

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "beta alpha gamma"),          # words present, wrong order
            (3, "alpha the beta"),            # stop word removed -> adjacent
            (4, "alpha beta alpha beta"),     # two matches
            (5, "alpha"),                     # partial phrase only
        ],
        ["doc_id", "text"],
    )
    idx = positional_index(docs)
    got = {r["doc_id"]: r["n_matches"] for r in
           phrase_search(idx, "alpha beta").collect()}
    assert got == {1: 1, 3: 1, 4: 2}


def test_phrase_search_repeated_word_phrase(spark):
    from orientdb_spark.fulltext import phrase_search, positional_index

    docs = spark.createDataFrame(
        [(1, "x batch batch y"), (2, "batch x batch")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["n_matches"] for r in
           phrase_search(positional_index(docs), "batch batch").collect()}
    assert got == {1: 1}


def test_phrase_search_rejects_stopword_only_phrase(spark):
    import pytest as _pytest

    from orientdb_spark.fulltext import phrase_search, positional_index

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        phrase_search(positional_index(docs), "the and")
