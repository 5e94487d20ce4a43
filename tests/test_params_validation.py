"""Positional parameters (prepared statements), fetch-plan string form,
and schema constraint validation on save
(tests:database/auto/CRUDDocumentValidationTest.java mirrored).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orientdb_spark import Engine
from orientdb_spark.catalog import OProperty
from orientdb_spark.errors import OCommandExecutionException, OValidationException
from orientdb_spark.fetchplan import fetch, parse_fetch_plan
from orientdb_spark.otypes import OType

from tests.conftest import SF_DIR


def test_positional_params_bind_and_rebind(engine):
    sql = "select n_name from nation where n_nationkey = ? or n_name = ?"
    a = engine.query(sql, params=[3, "NATION_5"])
    assert sorted(r["n_name"] for r in a) == ["NATION_3", "NATION_5"]
    # same cached statement, new params
    b = engine.query(sql, params=[7, "NATION_9"])
    assert sorted(r["n_name"] for r in b) == ["NATION_7", "NATION_9"]


def test_params_in_limit_and_in_list(engine):
    rows = engine.query(
        "select n_nationkey from nation where n_nationkey in [?, ?] order by n_nationkey",
        params=[2, 4],
    )
    assert [r["n_nationkey"] for r in rows] == [2, 4]


def test_unbound_param_raises(engine):
    with pytest.raises(OCommandExecutionException):
        engine.query("select from nation where n_nationkey = ?")


def test_fetch_plan_string_form(engine):
    plan = parse_fetch_plan("*:-1")
    assert plan == {"*": -1}
    df = fetch(engine, "orders", "o_custkey:2")
    row = df.filter(F.col("o_orderkey") == 1).first()
    assert row["o_custkey__doc"]["c_name"] is not None
    assert row["o_custkey__doc"]["c_nationkey__doc"]["n_name"] is not None


def test_fetch_plan_unbounded_cycle_safe(spark):
    # self-linked class: unbounded plan must terminate (class-cycle cut)
    eng = Engine(spark)
    df = spark.createDataFrame([(1, 2), (2, 1)], "id long, next long")
    eng.register_dataframe(
        "loop", df, rid_pos=lambda d: F.col("id"), links={"next": ("loop", "id")}
    )
    out = fetch(eng, "loop", "*:-1")
    assert out.count() == 2  # terminated; one level unrolled
    assert "next__doc" in out.columns


def _constrained_engine(spark):
    eng = Engine(spark)
    eng.register_dataframe(
        "person",
        spark.createDataFrame([("ada", 30)], "name string, age int"),
        rid_pos=lambda d: F.lit(0),
    )
    cls = eng.catalog.get("person")
    cls.properties["name"] = OProperty(
        name="name", otype=OType.STRING, mandatory=True, not_null=True, min="2", max="10"
    )
    cls.properties["age"] = OProperty(name="age", otype=OType.INTEGER, min="0", max="150")
    return eng


def test_validation_accepts_valid_insert(spark):
    eng = _constrained_engine(spark)
    eng.command("insert into person (name, age) values ('bob', 42)")
    assert eng.table("person").count() == 2


def test_validation_rejects_null_and_bounds(spark):
    eng = _constrained_engine(spark)
    with pytest.raises(OValidationException):
        eng.command("insert into person (name, age) values (null, 42)")
    with pytest.raises(OValidationException):
        eng.command("insert into person (name, age) values ('x', 42)")  # len < 2
    with pytest.raises(OValidationException):
        eng.command("insert into person (name, age) values ('bob', 200)")  # > 150
    with pytest.raises(OValidationException):
        eng.command("insert into person (age) values (42)")  # mandatory name missing


def test_validation_applies_to_update(spark):
    eng = _constrained_engine(spark)
    with pytest.raises(OValidationException):
        eng.command("update person set age = -5 where name = 'ada'")
    # untouched rows don't trigger validation
    eng.command("insert into person (name, age) values ('bob', 42)")
    eng.command("update person set age = 31 where name = 'ada'")
    assert eng.query("select age from person where name = 'ada'")[0]["age"] == 31


def test_orderby_and_update_through_link_chain(spark):
    eng = Engine(spark)
    eng.register_parquet_dir(SF_DIR)
    r = eng.query(
        "select o_orderkey from orders where o_orderkey <= 5 "
        "order by o_custkey.c_name, o_orderkey"
    )
    assert len(r) == 6  # sorted by the joined customer name
    eng.register_dataframe(
        "orders_lc",
        spark.read.parquet(f"{SF_DIR}/orders.parquet"),
        links={"o_custkey": ("customer", "c_custkey")},
    )
    eng.command("update orders_lc set o_orderpriority = 'X' where o_custkey.c_nationkey = 3")
    n = eng.query("select count(*) as n from orders_lc where o_orderpriority = 'X'")[0]["n"]
    m = eng.query("select count(*) as n from orders where o_custkey.c_nationkey = 3")[0]["n"]
    assert n == m > 0


def test_intents(spark):
    import pytest as _pytest

    eng = _constrained_engine(spark)
    eng.declare_intent("massiveinsert")
    eng.command("insert into person (name, age) values ('x', 999)")  # skips validation
    assert eng.table("person").count() == 2
    eng.declare_intent(None)
    with _pytest.raises(OValidationException):
        eng.command("insert into person (name, age) values ('y', 999)")
    with _pytest.raises(OCommandExecutionException):
        eng.declare_intent("nosuchintent")


def test_schema_mixed_insert_adds_field(spark):
    # schema-mixed documents: an INSERT may carry fields the schema never
    # declared (ODocument.java:55-57); older records read null there
    eng = Engine(spark)
    eng.register_dataframe(
        "mixed", spark.createDataFrame([(1, "a")], "id long, v string")
    )
    eng.command("insert into mixed (id, v, extra_field) values (2, 'b', 'surprise')")
    rows = {r["id"]: r["extra_field"] for r in eng.query("select id, extra_field from mixed")}
    assert rows == {1: None, 2: "surprise"}


def test_broken_link_null_propagates(spark):
    # missing link target → null, not an error (ODocument.rawField
    # ignore-to-null, SURVEY §7 hard part 2)
    eng = Engine(spark)
    a = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "id long, ref long")
    b = spark.createDataFrame([(10, "x"), (20, "y")], "tid long, name string")
    eng.register_dataframe("lp_tgt", b)
    eng.register_dataframe("lp_src", a, links={"ref": ("lp_tgt", "tid")})
    rows = {r["id"]: r["nm"] for r in eng.query("select id, ref.name as nm from lp_src")}
    assert rows == {1: "x", 2: "y", 3: None}
    assert [r["id"] for r in eng.query("select id from lp_src where ref.name is null")] == [3]


def test_traverse_unbounded_depth(spark):
    # traverse(0, -1): unbounded fixpoint with visited set terminates and
    # reaches the whole chain (SURVEY §7 hard part 3)
    eng = Engine(spark)
    rows = [(i, i + 1 if i < 10 else None) for i in range(11)]
    eng.register_dataframe(
        "chain10",
        spark.createDataFrame(rows, "id long, next long"),
        rid_pos=lambda d: F.col("id"),
        links={"next": ("chain10", "id")},
    )
    out = eng.query("select id from chain10 where any() traverse(0, -1) (id = 10) order by id")
    assert [r["id"] for r in out] == list(range(11))


def test_insert_collection_literal(spark):
    # ComplexTypesTest shape: embedded-collection literals in INSERT
    # (typed literal parsing incl. [] containers, OSQLHelper:112-164)
    eng = Engine(spark)
    eng.register_dataframe(
        "ct", spark.createDataFrame([(1, ["x"])], "id long, tags array<string>")
    )
    eng.command("insert into ct (id, tags) values (2, ['a', 'b'])")
    rows = {r["id"]: r["tags"] for r in eng.query("select id, tags from ct")}
    assert rows == {1: ["x"], 2: ["a", "b"]}
    assert [r["id"] for r in eng.query("select id from ct where tags contains 'a'")] == [2]


def test_create_link_inverse(spark):
    # CREATE LINK ... INVERSE: the target side gets a LINKLIST of matching
    # source rids (OCommandExecutorSQLCreateLink.java:158,202-230)
    eng = Engine(spark)
    eng.register_dataframe(
        "inv_n",
        spark.read.parquet(f"{SF_DIR}/nation.parquet"),
        rid_pos=lambda d: F.col("n_nationkey"),
    )
    eng.register_dataframe(
        "inv_r",
        spark.read.parquet(f"{SF_DIR}/region.parquet"),
        rid_pos=lambda d: F.col("r_regionkey"),
    )
    eng.command("create link nations from inv_n.n_regionkey to inv_r.r_regionkey inverse")
    rows = eng.table("inv_r").select("r_regionkey", F.size("nations").alias("n")).collect()
    per_region = {r["r_regionkey"]: r["n"] for r in rows}
    # every nation rid lands in exactly one region's LINKLIST
    assert sum(per_region.values()) == 25
    prop = eng.catalog.get("inv_r").properties["nations"]
    assert prop.linked_class == "inv_n"


def test_traverse_explicit_any_fields(spark):
    # traverse(0,3,any()): explicit any() field spec equals the default
    # (OQueryOperatorTraverse.java:167 seeds fields with "any()";
    # SQLSelectTest.java:278 passes it explicitly)
    eng = Engine(spark)
    rows = [(i, i + 1 if i < 5 else None) for i in range(6)]
    eng.register_dataframe(
        "chain_any",
        spark.createDataFrame(rows, "id long, next long"),
        rid_pos=lambda d: F.col("id"),
        links={"next": ("chain_any", "id")},
    )
    explicit = eng.query(
        "select id from chain_any where any() traverse(0, 3, any()) (id = 5) order by id"
    )
    default = eng.query(
        "select id from chain_any where any() traverse(0, 3) (id = 5) order by id"
    )
    assert [r["id"] for r in explicit] == [r["id"] for r in default] == [2, 3, 4, 5]


def test_continuation_operator_param_validation(spark):
    """Bad parameters fail fast with ValueError, not mid-job."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.dedup import duplicate_spans
    from orientdb_spark.pipeline.text import cooccurrence, vocabulary
    from orientdb_spark.scale import bloom_filter_build, cms_build
    from orientdb_spark.temporal import gap_fill, rolling_aggregate, scd2_intervals

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    ev = spark.createDataFrame([(1, "k")], ["id", "key"])
    cases = [
        lambda: duplicate_spans(docs, n=0),
        lambda: duplicate_spans(docs, min_df=0),
        lambda: vocabulary(docs, min_count=0),
        lambda: vocabulary(docs, k=0),
        lambda: cooccurrence(docs, top_terms=0),
        lambda: bloom_filter_build(ev, "key", m_bits=100),   # not a /64 multiple
        lambda: bloom_filter_build(ev, "key", k=0),
        lambda: cms_build(ev, "key", width=0),
        lambda: gap_fill(docs, on=["doc_id"], step_sec=0),
        lambda: rolling_aggregate(docs, on=["doc_id"], window_sec=0),
        lambda: scd2_intervals(docs, key="doc_id", attrs=[]),
    ]
    for i, c in enumerate(cases):
        with _pytest.raises(ValueError):
            c()


def test_continuation_operators_handle_empty_input(spark):
    """Empty frames in -> empty frames out, no crash: the classic
    empty-partition failure mode checked across the continuation
    operator batch."""
    from pyspark.sql import functions as F

    from orientdb_spark.graph import Graph
    from orientdb_spark.pipeline.dedup import duplicate_spans
    from orientdb_spark.pipeline.profile import histogram, json_profile, k_anonymity
    from orientdb_spark.pipeline.sampling import contrastive_negatives, weighted_sample
    from orientdb_spark.pipeline.text import chunk_documents, cooccurrence, vocabulary
    from orientdb_spark.scale import cms_build
    from orientdb_spark.temporal import gap_fill, rolling_aggregate, scd2_intervals

    docs = spark.createDataFrame([], "doc_id long, text string")
    ev = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    outs = [
        duplicate_spans(docs),
        vocabulary(docs),
        cooccurrence(docs),
        chunk_documents(docs),
        json_profile(docs.select(F.col("text").alias("j")), "j"),
        k_anonymity(docs, ["doc_id"]),
        contrastive_negatives(docs),
        weighted_sample(docs.withColumn("w", F.lit(1.0)), "w", k=3),
        cms_build(docs, "text"),
        gap_fill(ev, on=["user_id"]),
        rolling_aggregate(ev, on=["user_id"]),
        scd2_intervals(ev, key="user_id", attrs=["value"]),
    ]
    for i, out in enumerate(outs):
        assert out.count() == 0, f"case {i} returned rows from empty input"
    # histogram over an empty column: a single all-null stats row must
    # not produce phantom bins
    assert histogram(ev, "value").count() == 0
    # empty graph: analytics return empty, not errors
    g = Graph(
        spark.createDataFrame([], "vid string"),
        spark.createDataFrame([], "src string, dst string"),
    )
    assert g.shortest_paths(["nowhere"], 2).count() == 1  # source itself
    assert g.label_propagation(1).count() == 0
