"""Record hooks — trigger-style callbacks on the write path.

Reference: core:hook/ORecordHook.java:27-33 (before/after CRUD events,
registered on the database) with index maintenance implemented as a hook
(core:index/OPropertyIndexManager.java); e2e test
tests:database/auto/HookTest.java counts invocations per event.

Distributed adaptation: the reference fires per record; on Spark a DML
statement is one declarative rewrite, so hooks fire once per statement
with the affected class and row count. Per-row side effects would force
row-at-a-time execution — exactly what the engine avoids — so hooks that
need row data receive the statement's (lazy) DataFrame instead.
"""

from __future__ import annotations

from typing import Callable

# event names mirror ORecordHook's enum (statement-level)
BEFORE_CREATE = "before_create"
AFTER_CREATE = "after_create"
BEFORE_UPDATE = "before_update"
AFTER_UPDATE = "after_update"
BEFORE_DELETE = "before_delete"
AFTER_DELETE = "after_delete"

Hook = Callable[[str, str, dict], None]


class HookManager:
    def __init__(self) -> None:
        self._hooks: list[Hook] = []

    def register(self, hook: Hook) -> Hook:
        self._hooks.append(hook)
        return hook

    def unregister(self, hook: Hook) -> None:
        if hook in self._hooks:
            self._hooks.remove(hook)

    def fire(self, event: str, class_name: str, detail: dict | None = None) -> None:
        for h in list(self._hooks):
            h(event, class_name, detail or {})


def fulltext_maintenance_hook(engine) -> Hook:
    """Index maintenance as a hook — the reference's OPropertyIndexManager
    pattern: after any DML on a class with a FULLTEXT-indexed property,
    rebuild that property's inverted-index table."""

    def hook(event: str, class_name: str, detail: dict) -> None:
        if not event.startswith("after_"):
            return
        if not engine.catalog.has(class_name):
            return
        cls = engine.catalog.get(class_name)
        for p in cls.properties.values():
            if p.index_type == "fulltext":
                from orientdb_spark.fulltext import build_fulltext_index

                build_fulltext_index(engine, class_name, p.name)

    return hook
