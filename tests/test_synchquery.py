"""OSQLSynchQuery auto-resume pagination (OSQLSynchQuery.java; the
SQLSelectTest.java:532-575 pagination loop: rerun the same query object
with LIMIT until it returns nothing, with no repeated records)."""

from __future__ import annotations

import pytest

from orientdb_spark import OSQLSynchQuery
from orientdb_spark.errors import OCommandExecutionException


def test_paginate_until_empty(engine):
    q = OSQLSynchQuery("select n_nationkey, n_name from nation limit 7")
    seen = []
    pages = 0
    while True:
        page = q.run(engine)
        if not page:
            break
        pages += 1
        assert len(page) <= 7
        seen.extend(r.n_nationkey for r in page)
        assert pages < 20
    assert sorted(seen) == list(range(25))
    assert len(seen) == len(set(seen))  # no record repeated across pages
    assert pages == 4  # 7+7+7+4


def test_reset_restarts(engine):
    q = OSQLSynchQuery("select r_regionkey from region limit 3")
    first = [r.r_regionkey for r in q.run(engine)]
    q.reset()
    again = [r.r_regionkey for r in q.run(engine)]
    assert first == again


def test_pagination_respects_where(engine):
    q = OSQLSynchQuery(
        "select n_nationkey from nation where n_regionkey = 1 limit 2"
    )
    seen = []
    while True:
        page = q.run(engine)
        if not page:
            break
        seen.extend(r.n_nationkey for r in page)
    expected = sorted(
        r.n_nationkey
        for r in engine.query("select n_nationkey from nation where n_regionkey = 1")
    )
    assert sorted(seen) == expected


def test_order_by_rejected(engine):
    q = OSQLSynchQuery("select n_name from nation order by n_name limit 5")
    with pytest.raises(OCommandExecutionException):
        q.run(engine)
