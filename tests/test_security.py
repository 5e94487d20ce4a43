"""GRANT/REVOKE enforcement at query entry (ORole CRUD bitmask checked
before execution — OCommandExecutorSQLSelect.java:90,158-165)."""

from __future__ import annotations

import pytest

from orientdb_spark import Engine
from orientdb_spark.security import OSecurityAccessException

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def eng(spark):
    e = Engine(spark)
    e.register_parquet_dir(SF)
    return e


def test_admin_unrestricted(eng):
    assert len(eng.query("select r_name from region")) == 5


def test_role_without_grant_denied(eng):
    eng.set_role("reader")
    with pytest.raises(OSecurityAccessException, match="READ"):
        eng.sql("select r_name from region")
    eng.set_role(None)
    assert len(eng.query("select r_name from region")) == 5


def test_grant_read_allows_select_only(eng):
    eng.command("grant read on database.class.region to reader")
    eng.set_role("reader")
    assert len(eng.query("select r_name from region")) == 5
    # other classes still denied
    with pytest.raises(OSecurityAccessException):
        eng.sql("select n_name from nation")
    # writes denied
    with pytest.raises(OSecurityAccessException, match="CREATE"):
        eng.command("insert into region (r_regionkey, r_name) values (99, 'X')")
    with pytest.raises(OSecurityAccessException, match="UPDATE"):
        eng.command("update region set r_name = 'X'")
    with pytest.raises(OSecurityAccessException, match="DELETE"):
        eng.command("delete from region where r_regionkey = 0")


def test_wildcard_resource_and_revoke(eng):
    eng.command("grant all on database.class.* to writer")
    eng.set_role("writer")
    assert len(eng.query("select n_name from nation")) == 25
    eng.set_role(None)
    eng.command("revoke delete on database.class.* from writer")
    eng.set_role("writer")
    with pytest.raises(OSecurityAccessException, match="DELETE"):
        eng.command("delete from nation where n_nationkey = 0")
    # read/update still fine
    assert len(eng.query("select n_name from nation where n_nationkey = 1")) == 1
