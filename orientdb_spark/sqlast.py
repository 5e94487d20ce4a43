"""AST for the engine's SQL dialect.

The dialect is the reference's OrientDB SQL (grammar embodied in
core:sql/filter/OSQLFilter.java:96-302 and
core:sql/OCommandExecutorSQLSelect.java:89-149) extended with the analytics
surface the reference left open (GROUP BY / HAVING / DISTINCT / set ops /
window-ready aggregates — SURVEY §2.5-2.6 'ours to build').

There is deliberately no logical/physical plan split here — like the
reference, the parsed command object IS the IR (SURVEY §3 'IR note'); the
real optimizer is Catalyst, which sees the compiled DataFrame plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Expr:
    pass


@dataclass
class Lit(Expr):
    value: object  # python scalar; None for NULL


@dataclass
class Param(Expr):
    """Positional ``?`` parameter — bound by Engine.sql(text, params=[...])
    before compilation (prepared-statement surface: the reference re-runs a
    parsed command with new params, core:sql/OCommandExecutorSQLSelect.java
    :86-88 compile-once javadoc)."""

    index: int


def bind_params(node, params: list):
    """Replace every Param(i) with Lit(params[i]) — generic dataclass walk
    returning a rebound copy (the original parsed command stays cacheable)."""
    import dataclasses

    if isinstance(node, Param):
        from orientdb_spark.errors import OCommandExecutionException

        if params is None or node.index >= len(params):
            raise OCommandExecutionException(
                f"Missing value for positional parameter #{node.index}"
            )
        return Lit(params[node.index])
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        changes = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            nv = bind_params(v, params)
            if nv is not v:
                changes[f.name] = nv
        return dataclasses.replace(node, **changes) if changes else node
    if isinstance(node, list):
        out = [bind_params(i, params) for i in node]
        return out if any(a is not b for a, b in zip(out, node)) else node
    if isinstance(node, tuple):
        out = tuple(bind_params(i, params) for i in node)
        return out if any(a is not b for a, b in zip(out, node)) else node
    return node


def has_params(node) -> bool:
    import dataclasses

    if isinstance(node, Param):
        return True
    if dataclasses.is_dataclass(node) and not isinstance(node, type):
        return any(has_params(getattr(node, f.name)) for f in dataclasses.fields(node))
    if isinstance(node, (list, tuple)):
        return any(has_params(i) for i in node)
    return False


@dataclass
class ListLit(Expr):
    items: list[Expr]


@dataclass
class Rid(Expr):
    cluster: int
    pos: int


@dataclass
class FieldPart:
    name: str


@dataclass
class MethodPart:
    """Chained value method, e.g. .toUpperCase() — registry
    core:sql/filter/OSQLFilterFieldOperator.java:25-31."""

    name: str
    args: list[Expr] = field(default_factory=list)


@dataclass
class FieldPath(Expr):
    """Dot chain: plain/nested/link field hops + value methods
    (core:sql/filter/OSQLFilterItemAbstract.java:48-118)."""

    parts: list[FieldPart | MethodPart]

    def head(self) -> str:
        first = self.parts[0]
        assert isinstance(first, FieldPart)
        return first.name


@dataclass
class Func(Expr):
    """Free function call (registry core:sql/OSQLEngine.java:26-49)."""

    name: str
    args: list[Expr]
    distinct: bool = False  # count(distinct x)
    chain: list[MethodPart] = field(default_factory=list)


@dataclass
class Attr(Expr):
    """Record attribute @rid/@class/@version/@type/@size/@fields
    (core:sql/filter/OSQLFilterItemRecordAttrib.java:24-60)."""

    name: str
    chain: list[MethodPart] = field(default_factory=list)


@dataclass
class ColIdx(Expr):
    """column(i) positional access (core:sql/filter/OSQLFilterItemColumn.java:27-44)."""

    index: int
    chain: list[MethodPart] = field(default_factory=list)


@dataclass
class AnyField(Expr):
    """any() wildcard (core:sql/filter/OSQLFilterItemFieldAny.java)."""

    chain: list[MethodPart] = field(default_factory=list)


@dataclass
class AllFields(Expr):
    """all() wildcard (core:sql/filter/OSQLFilterItemFieldAll.java)."""

    chain: list[MethodPart] = field(default_factory=list)


@dataclass
class Star(Expr):
    pass


@dataclass
class Arith(Expr):
    op: str  # + - * / %
    left: Expr
    right: Expr


@dataclass
class Neg(Expr):
    operand: Expr


# --- conditions -----------------------------------------------------------


@dataclass
class BinCond(Expr):
    """Binary condition node (core:sql/filter/OSQLFilterCondition.java).

    ``op`` is the lower-cased operator keyword from the registry
    (core:sql/OSQLHelper.java:63-68). ``op_params`` carries configure()
    parameters for parameterized operators like traverse(start,end,fields)
    (core:sql/operator/OQueryOperatorTraverse.java:160-176).
    """

    op: str
    left: Expr
    right: Expr
    op_params: list[object] = field(default_factory=list)
    negated: bool = False  # NOT IN / NOT LIKE


@dataclass
class IsNull(Expr):
    operand: Expr
    negated: bool = False


@dataclass
class Between(Expr):
    operand: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclass
class And(Expr):
    left: Expr
    right: Expr


@dataclass
class Or(Expr):
    left: Expr
    right: Expr


@dataclass
class Not(Expr):
    operand: Expr


# --- commands --------------------------------------------------------------


@dataclass
class ClassTarget:
    name: str
    alias: str | None = None
    polymorphic: bool = True


@dataclass
class ClusterTarget:
    name: str


@dataclass
class RidTarget:
    rids: list[Rid]


@dataclass
class Projection:
    expr: Expr
    alias: str | None = None


@dataclass
class OrderItem:
    expr: Expr
    ascending: bool = True


@dataclass
class SelectCmd:
    projections: list[Projection]  # empty == SELECT * (bare select)
    target: ClassTarget | ClusterTarget | RidTarget | "SelectCmd"
    where: Expr | None = None
    group_by: list[Expr] | None = None
    having: Expr | None = None
    order_by: list[OrderItem] | None = None
    limit: int | None = None
    range_: tuple[Rid, Rid | None] | None = None
    distinct: bool = False
    flatten: str | None = None  # FLATTEN(field) projection (SQLSelect.java:481-491)


@dataclass
class InsertCmd:
    class_name: str
    fields: list[str]
    values: list[Expr]


@dataclass
class UpdateCmd:
    class_name: str
    sets: list[tuple[str, Expr]]
    adds: list[tuple[str, Expr]]
    puts: list[tuple[str, Expr, Expr]]  # field, key, value
    removes: list[tuple[str, Expr | None]]  # field, optional value
    where: Expr | None = None


@dataclass
class DeleteCmd:
    class_name: str
    where: Expr | None = None


@dataclass
class CreateClassCmd:
    name: str
    super_class: str | None = None


@dataclass
class CreatePropertyCmd:
    class_name: str
    prop_name: str
    type_name: str
    linked: str | None = None


@dataclass
class RemovePropertyCmd:
    class_name: str
    prop_name: str


@dataclass
class CreateIndexCmd:
    class_name: str
    prop_name: str
    index_type: str  # unique | notunique | fulltext


@dataclass
class RemoveIndexCmd:
    class_name: str
    prop_name: str


@dataclass
class CreateLinkCmd:
    """CREATE LINK name FROM A.f TO B.g [INVERSE]
    (core:sql/OCommandExecutorSQLCreateLink.java:36-230)."""

    link_name: str
    from_class: str
    from_field: str
    to_class: str
    to_field: str
    inverse: bool = False


@dataclass
class TruncateCmd:
    class_name: str


@dataclass
class GrantCmd:
    permission: str
    resource: str
    role: str
    revoke: bool = False
