"""Optimistic transactions — buffered writes + commit-time conflict check.

Reference: core:tx/OTransactionOptimistic.java:22-45 — changes buffer in
the transaction; commit re-checks each touched record's version and
raises OConcurrentModificationException on a mismatch (test
tests:database/auto/TransactionOptimisticTest.java:40-90).

Spark adaptation: DML is class-granular copy-on-write (SURVEY §3.3), so
the transaction snapshots each class's table identity at begin and
buffers its own rewrites in an isolated overlay catalog. Commit succeeds
only if no touched class was replaced underneath (first-committer-wins at
class granularity — the per-record version column still travels with the
rows for parity/visibility); otherwise OConcurrentModificationException,
and the engine state is untouched (atomic: all classes install or none).
"""

from __future__ import annotations

from orientdb_spark.errors import OConcurrentModificationException


class Transaction:
    def __init__(self, engine):
        self.engine = engine
        self._snapshot = {
            name: engine.catalog.get(name).df_supplier
            for name in engine.catalog.class_names()
        }
        self._touched: set[str] = set()
        self._overlay: dict[str, object] = {}  # class -> df_supplier at tx end
        self._active = True

    # -- buffered operations -----------------------------------------------------

    def command(self, text: str):
        """Run DML against the transaction's view: the engine executes on a
        temporary overlay and the result is captured into the tx buffer
        instead of the shared catalog."""
        self._check_active()
        from orientdb_spark.parser import parse
        from orientdb_spark import sqlast as A

        cmd = parse(text)
        target = getattr(cmd, "class_name", None)
        if target is None:
            raise OConcurrentModificationException(
                "Only class-targeted DML participates in a transaction"
            )
        cat = self.engine.catalog
        cls = cat.get(target)
        saved = cls.df_supplier
        # start from the tx's buffered view if this class was already touched
        if target.lower() in {t.lower() for t in self._touched}:
            cls.df_supplier = self._overlay[target.lower()]
        try:
            result = self.engine.command(text)
            self._overlay[target.lower()] = cls.df_supplier
            self._touched.add(target)
            return result
        finally:
            cls.df_supplier = saved

    def query(self, text: str):
        """Read inside the transaction: touched classes resolve to the
        buffered overlay (read-your-writes). Returns collected rows — a
        lazy plan would outlive the overlay scope."""
        self._check_active()
        cat = self.engine.catalog
        saved = {}
        for name in self._touched:
            cls = cat.get(name)
            saved[name] = cls.df_supplier
            cls.df_supplier = self._overlay[name.lower()]
        try:
            self.engine._plan_cache.clear()
            return self.engine.sql(text).collect()
        finally:
            for name, sup in saved.items():
                cat.get(name).df_supplier = sup
            self.engine._plan_cache.clear()

    # -- lifecycle ---------------------------------------------------------------

    def commit(self) -> None:
        """First-committer-wins: every touched class must still carry the
        table identity seen at begin; otherwise nothing installs and
        OConcurrentModificationException raises (the reference's
        commit-time version re-check, OTransactionOptimistic.java:22-45)."""
        self._check_active()
        cat = self.engine.catalog
        for name in self._touched:
            if cat.get(name).df_supplier is not self._snapshot.get(name):
                self._active = False
                raise OConcurrentModificationException(
                    f"Class '{name}' was modified since the transaction began"
                )
        for name in self._touched:
            cat.get(name).df_supplier = self._overlay[name.lower()]
        self.engine._plan_cache.clear()
        self._active = False

    def rollback(self) -> None:
        self._check_active()
        self._overlay.clear()
        self._touched.clear()
        self._active = False

    def _check_active(self) -> None:
        if not self._active:
            raise OConcurrentModificationException("Transaction is no longer active")
