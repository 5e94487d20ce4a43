"""Native query API — the fluent programmatic predicate DSL.

Reference: core:query/nativ/OQueryContextNative.java:25-135+ (operators:
and/or/not/like/matches/eq/different/between/minor[Eq]/major[Eq]/
toInt/toLong/toFloat/toChar…), runners ONativeSynchQuery /
ONativeAsynchQuery.java:30-84 evaluating ``filter(ctx)`` per record.

On Spark the fluent builder *is* the DataFrame Column API (SURVEY §2.11:
"expose thin aliases only") — this module keeps the reference's method
names and chaining shape but accumulates one Column expression, so the
compiled predicate ships to the JVM instead of evaluating per record in
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from orientdb_spark.errors import OCommandExecutionException


class OQueryContextNative:
    """Fluent predicate builder: ``ctx.field("nick").like("N%").and_()
    .field("followers").major(10)``. Terminal comparisons fold the current
    operand into the accumulated expression with the pending connective."""

    def __init__(self) -> None:
        self._expr: Column | None = None
        self._cur: Column | None = None
        self._pending: str = "and"
        self._negate_next = False

    # -- operand selection -------------------------------------------------------

    def field(self, name: str) -> "OQueryContextNative":
        self._cur = F.col(name)
        return self

    column = field  # positional variant alias (OQueryContextNativePositional)

    # -- casts (toInt/toLong/toFloat/toChar) ------------------------------------

    def to_int(self) -> "OQueryContextNative":
        return self._cast("int")

    def to_long(self) -> "OQueryContextNative":
        return self._cast("long")

    def to_float(self) -> "OQueryContextNative":
        return self._cast("float")

    def to_char(self) -> "OQueryContextNative":
        return self._cast("string")

    toInt, toLong, toFloat, toChar = to_int, to_long, to_float, to_char

    def _cast(self, t: str) -> "OQueryContextNative":
        self._cur = self._operand().cast(t)
        return self

    # -- comparisons -------------------------------------------------------------

    def eq(self, v) -> "OQueryContextNative":
        return self._fold(self._operand() == F.lit(v))

    def different(self, v) -> "OQueryContextNative":
        return self._fold(self._operand() != F.lit(v))

    def like(self, pattern: str) -> "OQueryContextNative":
        return self._fold(self._operand().like(pattern))

    def matches(self, regex: str) -> "OQueryContextNative":
        return self._fold(self._operand().rlike(f"^(?:{regex})$"))

    def between(self, lo, hi) -> "OQueryContextNative":
        return self._fold(self._operand().between(F.lit(lo), F.lit(hi)))

    def minor(self, v) -> "OQueryContextNative":
        return self._fold(self._operand() < F.lit(v))

    def minor_eq(self, v) -> "OQueryContextNative":
        return self._fold(self._operand() <= F.lit(v))

    def major(self, v) -> "OQueryContextNative":
        return self._fold(self._operand() > F.lit(v))

    def major_eq(self, v) -> "OQueryContextNative":
        return self._fold(self._operand() >= F.lit(v))

    minorEq, majorEq = minor_eq, major_eq

    # -- connectives -------------------------------------------------------------

    def and_(self) -> "OQueryContextNative":
        self._pending = "and"
        return self

    def or_(self) -> "OQueryContextNative":
        self._pending = "or"
        return self

    def not_(self) -> "OQueryContextNative":
        self._negate_next = True
        return self

    # -- result ------------------------------------------------------------------

    def expression(self) -> Column:
        if self._expr is None:
            raise OCommandExecutionException("Empty native query context")
        return self._expr

    def _operand(self) -> Column:
        if self._cur is None:
            raise OCommandExecutionException("No field selected (call .field(name) first)")
        return self._cur

    def _fold(self, cond: Column) -> "OQueryContextNative":
        if self._negate_next:
            cond = ~cond
            self._negate_next = False
        if self._expr is None:
            self._expr = cond
        elif self._pending == "or":
            self._expr = self._expr | cond
        else:
            self._expr = self._expr & cond
        self._cur = None
        return self


class ONativeSynchQuery:
    """Synchronous runner (ONativeSynchQuery analog): one distributed
    filter, results collected."""

    def __init__(self, engine, class_name: str, ctx: OQueryContextNative):
        self.engine = engine
        self.class_name = class_name
        self.ctx = ctx

    def dataframe(self) -> DataFrame:
        return self.engine.table(self.class_name).filter(self.ctx.expression())

    def execute(self) -> list:
        return self.dataframe().collect()


class ONativeAsynchQuery(ONativeSynchQuery):
    """Push-based runner: per-row listener with abort-by-return-value
    (ONativeAsynchQuery.java:50-97)."""

    def execute(self, listener) -> None:  # type: ignore[override]
        for row in self.dataframe().toLocalIterator():
            if listener(row) is False:
                break
