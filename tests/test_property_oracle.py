"""Property-based dialect↔oracle equivalence.

Hypothesis generates random WHERE trees / projections over the customer
table; each generated dialect query must return the same multiset as the
mechanically-derived DuckDB SQL. This is the fuzzing layer on top of the
hand-written oracle cases (the reference relies on hand-written
self-verifying tests only — SURVEY §5 item 7 notes the gap).

Derandomized (fixed seed, no deadline) so CI is deterministic.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.conftest import assert_matches_oracle

NUM_COLS = ["c_custkey", "c_nationkey", "c_acctbal"]
STR_COLS = ["c_name", "c_mktsegment"] if False else ["c_name"]

_num_cmp = st.tuples(
    st.sampled_from(NUM_COLS),
    st.sampled_from(["=", "<>", "<", "<=", ">", ">="]),
    st.integers(min_value=0, max_value=2000),
)
# arithmetic left side: col * a + b <cmp> v — exercises precedence and
# numeric type mixing in the expression compiler
_arith_cmp = st.tuples(
    st.sampled_from(NUM_COLS),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=50),
    st.sampled_from(["<", ">="]),
    st.integers(min_value=0, max_value=5000),
)
_str_like = st.tuples(
    st.sampled_from(STR_COLS),
    st.sampled_from(["Customer#%", "%1", "%0000%"]),
)


def _leaf_to_sqls(leaf) -> tuple[str, str]:
    if len(leaf) == 5:
        c, a, b, op, v = leaf
        e = f"{c} * {a} + {b} {op} {v}"
        return e, e
    if len(leaf) == 3:
        c, op, v = leaf
        return f"{c} {op} {v}", f"{c} {op} {v}"
    c, pat = leaf
    return f"{c} like '{pat}'", f"{c} LIKE '{pat}'"


@st.composite
def where_tree(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        leaf = draw(st.one_of(_num_cmp, _str_like, _arith_cmp))
        return _leaf_to_sqls(leaf)
    l_d, l_o = draw(where_tree(depth=depth + 1))
    r_d, r_o = draw(where_tree(depth=depth + 1))
    conn = draw(st.sampled_from(["and", "or"]))
    neg = draw(st.booleans())
    d = f"({l_d} {conn} {r_d})"
    o = f"({l_o} {conn.upper()} {r_o})"
    if neg:
        return f"not {d}", f"NOT {o}"
    return d, o


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=where_tree())
def test_random_where_trees_match_oracle(engine, oracle, tree):
    dialect, ansi = tree
    df = engine.sql(f"select c_custkey from customer where {dialect}")
    assert_matches_oracle(df, oracle, f"SELECT c_custkey FROM customer WHERE {ansi}")


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    method=st.sampled_from(
        [
            ("c_name.toUpperCase()", "upper(c_name)"),
            ("c_name.toLowerCase().trim()", "trim(lower(c_name))"),
            ("c_name.left(6)", "substring(c_name, 1, 6)"),
            ("c_name.length()", "length(c_name)::INTEGER"),
            ("c_name.subString(2, 5)", "substring(c_name, 3, 3)"),
            ("c_name.append('!')", "c_name || '!'"),
            ("c_acctbal.asInteger()", "trunc(c_acctbal)::INTEGER"),
        ]
    ),
    key=st.integers(min_value=1, max_value=500),
)
def test_random_method_chains_match_oracle(engine, oracle, method, key):
    d_expr, o_expr = method
    df = engine.sql(f"select {d_expr} as v from customer where c_custkey = {key}")
    assert_matches_oracle(
        df, oracle, f"SELECT {o_expr} AS v FROM customer WHERE c_custkey = {key}"
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gcol=st.sampled_from(["c_nationkey", "c_mktsegment"]),
    fn=st.sampled_from(
        [
            ("count(*)", "count(*)::BIGINT"),
            ("round(sum(c_acctbal), 4)", "round(sum(c_acctbal), 4)"),
            ("min(c_custkey)", "min(c_custkey)"),
            ("round(max(c_acctbal), 4)", "round(max(c_acctbal), 4)"),
            ("round(avg(c_acctbal), 4)", "round(avg(c_acctbal), 4)"),
        ]
    ),
    having=st.integers(min_value=0, max_value=40),
    desc=st.booleans(),
    lim=st.integers(min_value=1, max_value=30),
)
def test_random_group_having_order_limit(engine, oracle, gcol, fn, having, desc, lim):
    """Fuzz the agg→HAVING→ORDER→LIMIT pipeline: random group column,
    aggregate, HAVING threshold, direction, and limit must match DuckDB.
    The group column tiebreaks the ordering so LIMIT truncation is
    deterministic on both engines."""
    d_agg, o_agg = fn
    direction = "desc" if desc else "asc"
    df = engine.sql(
        f"select {gcol}, {d_agg} as v from customer group by {gcol} "
        f"having count(*) > {having} order by v {direction}, {gcol} limit {lim}"
    )
    assert_matches_oracle(
        df,
        oracle,
        f"SELECT {gcol}, {o_agg} AS v FROM customer GROUP BY {gcol} "
        f"HAVING count(*) > {having} ORDER BY v {direction.upper()}, {gcol} LIMIT {lim}",
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    path=st.sampled_from(
        [
            # (dialect link path, equivalent join-derived ANSI expression)
            ("o_custkey.c_name", "c.c_name"),
            ("o_custkey.c_acctbal", "c.c_acctbal"),
            ("o_custkey.c_nationkey.n_name", "n.n_name"),
            ("o_custkey.c_nationkey.n_regionkey.r_name", "r.r_name"),
        ]
    ),
    lo=st.integers(min_value=0, max_value=5000),
    span=st.integers(min_value=1, max_value=400),
)
def test_random_link_chains_match_joins(engine, oracle, path, lo, span):
    """Fuzz pointer-chase navigation: every dialect link chain must equal
    the mechanically derived chain of equi-joins, over random orderkey
    windows (including empty ones)."""
    d_path, o_expr = path
    df = engine.sql(
        f"select o_orderkey, {d_path} as v from orders "
        f"where o_orderkey >= {lo} and o_orderkey < {lo + span}"
    )
    assert_matches_oracle(
        df,
        oracle,
        "SELECT o.o_orderkey, "
        + o_expr
        + " AS v FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        f"WHERE o.o_orderkey >= {lo} AND o.o_orderkey < {lo + span}",
    )


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    chain=st.sampled_from(
        [
            ("c_name.toUpperCase().trim()", "trim(upper(c_name))"),
            ("c_name.left(8).toLowerCase()", "lower(substring(c_name, 1, 8))"),
            ("c_name.trim().length()", "length(trim(c_name))::INTEGER"),
            ("c_name.subString(1, 4).toUpperCase()", "upper(substring(c_name, 2, 3))"),
            ("c_name.append('#').length()", "length(c_name || '#')::INTEGER"),
            (
                "c_name.toLowerCase().left(5).append('!')",
                "lower(substring(c_name, 1, 5)) || '!'",
            ),
        ]
    ),
    lo=st.integers(min_value=0, max_value=1400),
)
def test_random_composed_method_chains(engine, oracle, chain, lo):
    """Fuzz 2-3-deep method-chain compositions (the compiler folds each
    chain link onto the previous Column) over sliding key windows."""
    d_expr, o_expr = chain
    df = engine.sql(
        f"select {d_expr} as v from customer "
        f"where c_custkey >= {lo} and c_custkey < {lo + 40}"
    )
    assert_matches_oracle(
        df,
        oracle,
        f"SELECT {o_expr} AS v FROM customer "
        f"WHERE c_custkey >= {lo} AND c_custkey < {lo + 40}",
    )


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(inner=where_tree(), outer=where_tree())
def test_random_subquery_targets_match_oracle(engine, oracle, inner, outer):
    """Fuzz the FROM (select ...) path: a random inner WHERE tree under
    a random outer one must equal the nested DuckDB query — predicate
    composition across the subquery boundary."""
    in_d, in_o = inner
    out_d, out_o = outer
    df = engine.sql(
        f"select c_custkey from (select from customer where {in_d}) "
        f"where {out_d}"
    )
    assert_matches_oracle(
        df,
        oracle,
        f"SELECT c_custkey FROM (SELECT * FROM customer WHERE {in_o}) "
        f"WHERE {out_o}",
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cond=st.sampled_from(
        [
            # (field, value, link depth of that field from customer)
            ("n_name", "NATION_3", 1),
            ("n_name", "NATION_17", 1),
            ("r_name", "ASIA", 2),
            ("r_name", "EUROPE", 2),
        ]
    ),
    window=st.sampled_from([(0, 1), (0, 2), (1, 2), (2, 2), (0, 3)]),
)
def test_random_traverse_windows_match_depth_logic(engine, oracle, cond, window):
    """Fuzz TRAVERSE depth windows on the single-path customer→nation→
    region hierarchy: a condition on a field that lives at link depth d
    is satisfiable iff lo <= d <= hi, and then reachability reduces to
    the explicit join chain."""
    field, val, d = cond
    lo, hi = window
    df = engine.sql(
        f"select c_custkey from customer "
        f"where any() traverse({lo}, {hi}) ({field} = '{val}')"
    )
    if lo <= d <= hi:
        sql = (
            "SELECT c_custkey FROM customer c "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            f"WHERE {field} = '{val}'"
        )
    else:
        sql = "SELECT c_custkey FROM customer WHERE FALSE"
    assert_matches_oracle(df, oracle, sql)


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    leaves=st.lists(
        st.tuples(
            st.sampled_from(["c_custkey", "c_nationkey"]),
            st.sampled_from(["minor", "major", "eq", "minor_eq", "major_eq"]),
            st.integers(min_value=0, max_value=1500),
            st.sampled_from(["and", "or"]),
            st.booleans(),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_random_native_dsl_matches_oracle(engine, oracle, leaves):
    """Fuzz the native-query builder: random comparison chains with
    and/or/not must equal the LEFT-FOLDED SQL (the DSL folds each leaf
    onto the accumulated expression, so a.and(b).or(c) == (a AND b) OR c)."""
    from orientdb_spark.native import OQueryContextNative

    OPSQL = {"minor": "<", "major": ">", "eq": "=", "minor_eq": "<=", "major_eq": ">="}
    ctx = OQueryContextNative()
    sql = None
    for i, (col, op, val, conn, neg) in enumerate(leaves):
        if i:
            getattr(ctx, conn + "_")()
        if neg:
            ctx.not_()
        getattr(ctx.field(col), op)(val)
        frag = f"{col} {OPSQL[op]} {val}"
        if neg:
            frag = f"NOT ({frag})"
        sql = frag if sql is None else f"({sql}) {conn.upper()} ({frag})"
    df = engine.table("customer").filter(ctx.expression()).select("c_custkey")
    assert_matches_oracle(
        df, oracle, f"SELECT c_custkey FROM customer WHERE {sql}"
    )
