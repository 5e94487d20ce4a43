"""Optimistic transactions (OTransactionOptimistic / TransactionOptimisticTest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orientdb_spark import Engine
from orientdb_spark.errors import OConcurrentModificationException

from tests.conftest import SF_DIR


def _eng(spark):
    eng = Engine(spark)
    eng.register_dataframe("acct", spark.read.parquet(f"{SF_DIR}/region.parquet"))
    return eng


def test_tx_isolation_and_commit(spark):
    eng = _eng(spark)
    tx = eng.begin()
    tx.command("update acct set r_name = 'TX' where r_regionkey = 0")
    # read-your-writes inside the tx
    assert tx.query("select r_name from acct where r_regionkey = 0")[0]["r_name"] == "TX"
    # invisible outside until commit
    assert eng.query("select r_name from acct where r_regionkey = 0")[0]["r_name"] != "TX"
    tx.commit()
    assert eng.query("select r_name from acct where r_regionkey = 0")[0]["r_name"] == "TX"


def test_tx_conflict_first_committer_wins(spark):
    eng = _eng(spark)
    tx1 = eng.begin()
    tx2 = eng.begin()
    tx1.command("update acct set r_name = 'A' where r_regionkey = 1")
    tx2.command("update acct set r_name = 'B' where r_regionkey = 1")
    tx1.commit()
    with pytest.raises(OConcurrentModificationException):
        tx2.commit()
    # the loser's buffered change never landed
    assert eng.query("select r_name from acct where r_regionkey = 1")[0]["r_name"] == "A"


def test_tx_rollback_leaves_state(spark):
    eng = _eng(spark)
    before = eng.query("select r_name from acct where r_regionkey = 2")[0]["r_name"]
    tx = eng.begin()
    tx.command("update acct set r_name = 'GONE' where r_regionkey = 2")
    tx.rollback()
    assert eng.query("select r_name from acct where r_regionkey = 2")[0]["r_name"] == before
    with pytest.raises(OConcurrentModificationException):
        tx.commit()  # no longer active


def _eng_rid(spark):
    """acct with a STABLE record identity (rid_pos) — enables the
    per-record commit path (reference: OTransactionOptimistic.java:22-45
    re-checks each touched record's version, not whole-class state)."""
    eng = Engine(spark)
    eng.register_dataframe(
        "acct",
        spark.read.parquet(f"{SF_DIR}/region.parquet"),
        rid_pos=lambda df: F.col("r_regionkey"),
    )
    return eng


def test_tx_disjoint_records_both_commit(spark):
    eng = _eng_rid(spark)
    tx1 = eng.begin()
    tx2 = eng.begin()
    tx1.command("update acct set r_name = 'A' where r_regionkey = 1")
    tx2.command("update acct set r_name = 'B' where r_regionkey = 3")
    tx1.commit()
    tx2.commit()  # disjoint write-sets: rebases instead of failing
    rows = {
        r["r_regionkey"]: r["r_name"]
        for r in eng.query("select r_regionkey, r_name from acct")
    }
    assert rows[1] == "A" and rows[3] == "B"
    assert len(rows) == 5  # no rows lost or duplicated by the rebase


def test_tx_same_record_still_conflicts(spark):
    eng = _eng_rid(spark)
    tx1 = eng.begin()
    tx2 = eng.begin()
    tx1.command("update acct set r_name = 'A' where r_regionkey = 1")
    tx2.command("update acct set r_name = 'B' where r_regionkey = 1")
    tx1.commit()
    with pytest.raises(OConcurrentModificationException):
        tx2.commit()
    assert eng.query("select r_name from acct where r_regionkey = 1")[0]["r_name"] == "A"


def test_tx_update_of_concurrently_deleted_record_conflicts(spark):
    eng = _eng_rid(spark)
    tx1 = eng.begin()
    tx2 = eng.begin()
    tx1.command("delete from acct where r_regionkey = 2")
    tx2.command("update acct set r_name = 'B' where r_regionkey = 2")
    tx1.commit()
    with pytest.raises(OConcurrentModificationException):
        tx2.commit()
    assert not eng.query("select * from acct where r_regionkey = 2")


def test_tx_disjoint_inserts_both_commit(spark):
    eng = _eng_rid(spark)
    tx1 = eng.begin()
    tx2 = eng.begin()
    tx1.command("insert into acct (r_regionkey, r_name) values (100, 'N1')")
    tx2.command("insert into acct (r_regionkey, r_name) values (200, 'N2')")
    tx1.commit()
    tx2.commit()  # different rids: rebase keeps both inserts
    rows = {
        r["r_regionkey"]: r["r_name"]
        for r in eng.query("select r_regionkey, r_name from acct")
    }
    assert rows[100] == "N1" and rows[200] == "N2" and len(rows) == 7


def test_tx_insert_rid_collision_conflicts(spark):
    eng = _eng_rid(spark)
    tx1 = eng.begin()
    tx2 = eng.begin()
    tx1.command("insert into acct (r_regionkey, r_name) values (100, 'N1')")
    tx2.command("insert into acct (r_regionkey, r_name) values (100, 'N2')")
    tx1.commit()
    with pytest.raises(OConcurrentModificationException):
        tx2.commit()  # same rid now taken in the live table
    rows = [r["r_name"] for r in eng.query("select r_name from acct where r_regionkey = 100")]
    assert rows == ["N1"]
