"""Plan-shape regression tests: the scale properties the engine claims
(filter pushdown to the parquet scan, column pruning, shuffle-free
single-pass text ops) asserted against the actual Catalyst plans, so a
future refactor that silently un-pushes a filter or adds an exchange
fails here rather than only showing up as a bench regression.
"""

from __future__ import annotations

import re

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _nodes(plan: str, name: str) -> int:
    # formatted explain prints each node in the tree AND in the detail
    # section — count the numbered detail headers only
    return len(re.findall(rf"^\(\d+\) {name}", plan, flags=re.MULTILINE))


def test_tpch_q6_pushdown_and_pruning(spark):
    plan = _formatted(QUERIES["tpch_q6_forecast"](spark, SF_DIR))
    # the date/discount/quantity predicates must reach the parquet reader
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "l_shipdate" in pushed or "l_discount" in pushed, pushed
    # the scan must not read the wide comment column for a 4-column query
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_comment" not in read and "l_shipdate" in read, read


def test_filter_projection_pushdown(spark):
    plan = _formatted(QUERIES["filter_projection"](spark, SF_DIR))
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    assert "n_regionkey" in pushed, pushed
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "n_comment" not in read, read


def test_text_quality_is_single_pass(spark):
    """quality_score is one scan + codegen projections — any Exchange
    here means someone introduced a shuffle into a per-row operator."""
    plan = _formatted(QUERIES["text_quality_score"](spark, SF_DIR))
    assert _nodes(plan, "Exchange") == 0, plan
    assert _nodes(plan, "Scan parquet") == 1


def test_split_assign_is_shuffle_free(spark):
    """Deterministic split assignment is a pure per-row hash — the
    100 TB contract is exactly 'no shuffle, no RNG state'."""
    plan = _formatted(QUERIES["sample_split_assign"](spark, SF_DIR))
    assert _nodes(plan, "Exchange") == 0, plan


def test_winnow_fingerprints_shuffle_only_for_digest(spark):
    """The fingerprint generation itself is columnar (scan + generate);
    the single allowed exchange is the digest groupBy in the entry."""
    plan = _formatted(QUERIES["text_winnow_fingerprint"](spark, SF_DIR))
    assert _nodes(plan, "Exchange") <= 1, plan


def test_line_quality_and_pii_zero_exchange(spark):
    """line_quality and pii_scan are single-projection array/regex ops —
    the whole pass must ride the parquet scan with no shuffle."""
    for name in ("text_line_quality", "text_pii_redact"):
        plan = _formatted(QUERIES[name](spark, SF_DIR))
        assert _nodes(plan, "Exchange") == 0, (name, plan)
        assert _nodes(plan, "Scan parquet") == 1, name


def test_strip_boilerplate_bounded_exchanges(spark):
    """Boilerplate removal: detection groupBy + reassembly groupBy are
    the only corpus-sized shuffles; the boilerplate set itself must join
    in as a broadcast, never a shuffle join."""
    plan = _formatted(QUERIES["text_boilerplate"](spark, SF_DIR))
    assert _nodes(plan, "BroadcastHashJoin") >= 1, plan
    assert _nodes(plan, "SortMergeJoin") == 0, plan
    # corpus shuffles: line-frequency agg + per-source totals + final
    # reassembly (partial aggs make each a single pair of exchanges)
    assert _nodes(plan, "Exchange") <= 4, plan
