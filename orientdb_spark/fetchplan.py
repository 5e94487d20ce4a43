"""Fetch plans — join-ahead prefetch of linked records.

Reference: core:fetch/OFetchHelper.java:37-54 (buildFetchPlan: per-field
``field:depth`` entries, ``*`` wildcard, -1 unbounded) and the recursive
prefetch :57-127; the remote protocol pushes prefetched records into the
client cache (ONetworkProtocolBinary.java:478-535).

Spark shape: each planned link field joins its target class and assembles
the linked record as a nested struct column ``<field>__doc`` — the
"join-ahead + nested-struct assembly" of SURVEY §2.1. Depth recursion
follows links-of-links up to the per-field depth (cycles cut by depth).
Small targets broadcast; the join is the prefetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from orientdb_spark.catalog import RID_COL


# unbounded (-1) plans are cycle-cut by class revisit; this cap additionally
# bounds join-chain depth on long acyclic link chains (the reference cuts
# per-record cycles with a visited-RID set at fetch time, OFetchHelper :75)
_UNBOUNDED_MAX_DEPTH = 16


def parse_fetch_plan(plan: str) -> dict[str, int]:
    """``"field:depth …"`` string form, '*' wildcard, -1 unbounded —
    OFetchHelper.buildFetchPlan (core:fetch/OFetchHelper.java:37-54)."""
    out: dict[str, int] = {}
    for part in plan.split():
        if ":" not in part:
            raise ValueError(f"Invalid fetch plan entry '{part}' (want field:depth)")
        fname, depth = part.rsplit(":", 1)
        out[fname] = int(depth)
    return out


def fetch(engine, class_name: str, plan: dict[str, int] | str) -> DataFrame:
    """Load ``class_name`` with linked docs prefetched per ``plan``
    (field → depth; '*' applies to every link field; a string plan is
    parsed with parse_fetch_plan). Linked records appear as struct
    columns named ``<field>__doc``."""
    if isinstance(plan, str):
        plan = parse_fetch_plan(plan)
    wildcard = plan.get("*")
    df = engine.catalog.dataframe(class_name, polymorphic=True)
    cls = engine.catalog.get(class_name)
    return _expand(engine, df, cls, plan, wildcard, prefix="", path=(cls.name,))


def _expand(engine, df: DataFrame, cls, plan, wildcard, prefix: str, path: tuple = ()) -> DataFrame:
    catalog = engine.catalog
    for prop in list(cls.properties.values()):
        if not prop.linked_class:
            continue
        depth = plan.get(prop.name, wildcard)
        if depth is None or depth == 0:
            continue
        if depth == -1 and (
            path.count(prop.linked_class) >= 2 or len(path) > _UNBOUNDED_MAX_DEPTH
        ):
            continue  # class cycle: unroll one level, then stop
        target_cls = catalog.get(prop.linked_class)
        # RID links join on the @rid pseudo-column — materialize it
        # (mirrors Scope._ensure_link_join's with_meta rule)
        needs_meta = prop.linked_key in (None, RID_COL)
        target = catalog.dataframe(prop.linked_class, polymorphic=True, with_meta=needs_meta)
        # recurse first so nested levels are already assembled
        if depth - 1 != 0 or depth == -1:
            next_depth = depth - 1 if depth > 0 else -1
            target = _expand(
                engine,
                target,
                target_cls,
                {p.name: next_depth for p in target_cls.properties.values() if p.linked_class},
                None,
                prefix=prefix + prop.name + ".",
                path=path + (prop.linked_class,),
            )
        key = prop.linked_key or RID_COL
        doc_col = f"{prop.name}__doc"
        packed = target.select(
            F.col(key).alias("__fk"),
            F.struct(*[F.col(c) for c in target.columns]).alias(doc_col),
        )
        left_col = None
        for c in df.columns:
            if c.lower() == prop.name.lower():
                left_col = c
                break
        if left_col is None:
            continue
        df = df.join(packed, df[left_col] == packed["__fk"], "left").drop("__fk")
    return df
