"""OSQLSynchQuery — synchronous query object with auto-resume pagination.

Reference: core:sql/query/OSQLSynchQuery.java — a synch query carrying a
LIMIT, when re-executed, resumes from after the last RID it returned
(``getBeginRange`` feeds the next execution's begin range); exercised by
the pagination loop in core tests (SQLSelectTest.java:532-575: repeat
``select from X limit N`` on the same query object until empty).

Spark shape: each ``run`` compiles the statement with an injected
``RANGE <resume-rid>`` (keyset pagination on @rid — an indexed/prunable
predicate, never OFFSET-style skip-scanning, which is the part that
matters at scale), plus one companion @rid-projection of the same page to
learn the resume key. Pagination follows @rid order, like the reference's
cluster-order scan — ORDER BY queries don't auto-resume there either.
"""

from __future__ import annotations

from dataclasses import replace

from orientdb_spark import sqlast as A
from orientdb_spark.errors import OCommandExecutionException
from orientdb_spark.parser import parse


class OSQLSynchQuery:
    def __init__(self, text: str):
        self.text = text
        self._begin: tuple[int, int] | None = None

    def reset(self) -> None:
        """Forget the resume position — the next run starts from the top."""
        self._begin = None

    def run(self, engine) -> list:
        """Execute the next page; returns [] once the scan is exhausted."""
        cmd = parse(self.text)
        if not isinstance(cmd, A.SelectCmd):
            raise OCommandExecutionException("OSQLSynchQuery requires a SELECT")
        if cmd.order_by:
            raise OCommandExecutionException(
                "auto-resume pagination follows @rid order; ORDER BY queries "
                "cannot resume (reference: cluster-order scans only)"
            )
        if self._begin is not None:
            cmd = replace(cmd, range_=(A.Rid(*self._begin), None))
        rows = engine._select.compile(cmd).collect()
        if rows:
            # companion page of @rid only — same target/filters/range/limit —
            # to learn the resume key (max rid of the page, +1 exclusive)
            rid_cmd = replace(
                cmd, projections=[A.Projection(A.Attr("@rid"), "rid")], flatten=None
            )
            rid_rows = engine._select.compile(rid_cmd).collect()
            if rid_rows:
                last = max((r["rid"]["cluster"], r["rid"]["pos"]) for r in rid_rows)
                self._begin = (last[0], last[1] + 1)
        return rows
