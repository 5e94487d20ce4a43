"""TRAVERSE predicate — distributed graph-reachability filter.

Reference: core:sql/operator/OQueryOperatorTraverse.java:40-176 —
``<left> TRAVERSE(<start>[,<end>[,<fields>]]) (<cond>)`` is true for a
record when any document reachable from it through the named link fields
(default ``any()`` = every link field), within the depth window
[start, end] (end inclusive, -1 = unbounded), satisfies the inner
condition; a visited-RID set makes cycles safe (:75-76,101).

Depth convention (documented deviation): we count BFS hops from the root
record — root itself is depth 0, directly-linked docs depth 1 — whereas the
reference counts a scalar-link target at the start level and collection
elements one deeper. Hop counting is uniform and what the oracle SQL
encodes.

Implementation is the SURVEY §7 plan: an iterative frontier expansion where
the frontier is a DataFrame of (origin-rid, link-key value) pairs joined
against the linked class per hop, with an anti-join against the visited set
for cycle safety and ``localCheckpoint`` to cut lineage on long walks
(the reference's 100-deep linear-graph fixture is the stress case). All
work stays distributed — the driver only orchestrates the loop; no
per-record recursion, no collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from orientdb_spark import sqlast as A
from orientdb_spark.catalog import RID_COL, OClass
from orientdb_spark.errors import OCommandExecutionException
from orientdb_spark.expressions import Scope, compile_condition

_CHECKPOINT_EVERY = 8
_UNBOUNDED_SAFETY_CAP = 1000


def _link_fields(engine, cls: OClass, allowed: list[str] | None) -> list:
    props = []
    cur = cls
    seen = set()
    while cur is not None:
        for p in cur.properties.values():
            if p.linked_class and p.name.lower() not in seen:
                seen.add(p.name.lower())
                props.append(p)
        cur = engine.catalog.get(cur.super_class) if cur.super_class else None
    if allowed:
        allowed_l = {a.lower() for a in allowed}
        props = [p for p in props if p.name.lower() in allowed_l]
    return props


def apply_traverse_filter(engine, scope: Scope, cond: A.BinCond) -> DataFrame:
    params = cond.op_params or []
    start = int(params[0]) if len(params) > 0 else 0
    end = int(params[1]) if len(params) > 1 else -1
    fields: list[str] | None = None
    if len(params) > 2:
        fields = [f.strip() for f in ",".join(str(p) for p in params[2:]).split(",")]
        if any(f.lower() == "any()" for f in fields):
            fields = None
    elif isinstance(cond.left, A.FieldPath):
        fields = [cond.left.head()]
    # cond.left is AnyField() → all link fields (fields=None)

    inner_ast = cond.right
    catalog = engine.catalog
    if scope.cls is None:
        raise OCommandExecutionException("TRAVERSE requires a class target")
    if RID_COL not in scope.df.columns:
        raise OCommandExecutionException("TRAVERSE requires @rid metadata on the target")

    root_cls = scope.cls

    def eval_matches(df: DataFrame, cls: OClass) -> DataFrame:
        """origins whose current doc satisfies the inner condition."""
        s = Scope(catalog=catalog, functions=engine.functions, df=df, cls=cls)
        cond_col = compile_condition(s, inner_ast)
        return s.df.filter(cond_col).select(F.col("__origin"))

    matched: DataFrame | None = None

    def add_matches(m: DataFrame):
        nonlocal matched
        matched = m if matched is None else matched.unionByName(m)

    # depth 0: the root record itself
    root = scope.df
    if start <= 0:
        df0 = root.withColumn("__origin", F.col(f"`{RID_COL}`"))
        add_matches(eval_matches(df0, root_cls))

    # frontier per target class: DataFrame(__origin, __key) to be matched on
    # that class's linked_key column
    # visited per (class, key) pair guards against cycles
    def expand(df: DataFrame, cls: OClass) -> dict[tuple[str, str], DataFrame]:
        out: dict[tuple[str, str], DataFrame] = {}
        for p in _link_fields(engine, cls, fields):
            colname = None
            for c in df.columns:
                if c.lower() == p.name.lower():
                    colname = c
                    break
            if colname is None:
                continue
            key = p.linked_key or RID_COL
            col = F.col(f"`{colname}`")
            dtype = df.schema[colname].dataType.typeName()
            vals = (
                df.select(F.col("__origin"), F.explode(col).alias("__key"))
                if dtype == "array"
                else df.select(F.col("__origin"), col.alias("__key"))
            )
            vals = vals.filter(F.col("__key").isNotNull())
            k = (p.linked_class.lower(), key)
            out[k] = vals if k not in out else out[k].unionByName(vals)
        return out

    frontier = expand(root.withColumn("__origin", F.col(f"`{RID_COL}`")), root_cls)
    visited: dict[tuple[str, str], DataFrame] = {
        k: v.select("__origin", "__key") for k, v in frontier.items()
    }

    depth = 1
    max_depth = end if end >= 0 else _UNBOUNDED_SAFETY_CAP
    while frontier and depth <= max_depth:
        next_frontier: dict[tuple[str, str], DataFrame] = {}
        any_rows = False
        for (cls_name, key), fr in frontier.items():
            cls = catalog.get(cls_name)
            docs = catalog.dataframe(cls_name, with_meta=True)
            key_col = RID_COL if key == RID_COL else key
            joined = fr.join(docs, fr["__key"] == docs[key_col], "inner").drop("__key")
            if depth % _CHECKPOINT_EVERY == 0:
                joined = joined.localCheckpoint(eager=False)
            if depth >= start:
                add_matches(eval_matches(joined, cls))
            if depth < max_depth:
                for k, vals in expand(joined, cls).items():
                    nv = vals
                    if k in visited:
                        nv = nv.join(visited[k], ["__origin", "__key"], "left_anti")
                    next_frontier[k] = (
                        nv if k not in next_frontier else next_frontier[k].unionByName(nv)
                    )
        # update visited + check emptiness (forces evaluation per hop)
        pruned: dict[tuple[str, str], DataFrame] = {}
        for k, v in next_frontier.items():
            v = v.dropDuplicates(["__origin", "__key"])
            if end < 0:
                # unbounded walks must materialize to detect the fixpoint
                v = v.localCheckpoint(eager=True)
                if v.isEmpty():
                    continue
            visited[k] = (
                v if k not in visited else visited[k].unionByName(v).dropDuplicates()
            )
            pruned[k] = v
            any_rows = True
        frontier = pruned
        if end < 0 and not any_rows:
            break
        depth += 1

    if matched is None:
        return scope.df.limit(0)
    origins = matched.dropDuplicates(["__origin"])
    return scope.df.join(
        origins, scope.df[f"`{RID_COL}`"] == origins["__origin"], "left_semi"
    )
