"""Model-based DML fuzzing: random INSERT/UPDATE/DELETE sequences run
through the engine's SQL command path AND a sequential Python dict
model; final table states must agree exactly.

This covers interaction bugs single-command tests can't: updates over
previously-inserted rows, deletes of updated rows, predicates spanning
copy-on-write generations — the reference's DML semantics
(core:sql/OCommandExecutorSQLInsert/Update/Delete) under composition.
"""

from __future__ import annotations

import random

from orientdb_spark import Engine


def _apply_model(model: dict, op: tuple) -> None:
    kind = op[0]
    if kind == "insert":
        _, k, s, v = op
        model[k] = {"s": s, "v": v}
    elif kind == "update_v":
        _, pred_col, pred_val, new_v = op
        for k, row in model.items():
            if pred_col == "k" and k == pred_val:
                row["v"] = new_v
            elif pred_col == "s" and row["s"] == pred_val:
                row["v"] = new_v
    elif kind == "update_s":
        _, lo, new_s = op
        for row in model.values():
            if row["v"] >= lo:
                row["s"] = new_s
    elif kind == "delete":
        _, lo, hi = op
        for k in [k for k, r in model.items() if lo <= r["v"] < hi]:
            del model[k]


def _op_sql(op: tuple) -> str:
    kind = op[0]
    if kind == "insert":
        _, k, s, v = op
        return f"insert into fuzzdml (k, s, v) values ({k}, '{s}', {v})"
    if kind == "update_v":
        _, pred_col, pred_val, new_v = op
        rhs = f"'{pred_val}'" if pred_col == "s" else str(pred_val)
        return f"update fuzzdml set v = {new_v} where {pred_col} = {rhs}"
    if kind == "update_s":
        _, lo, new_s = op
        return f"update fuzzdml set s = '{new_s}' where v >= {lo}"
    _, lo, hi = op
    return f"delete from fuzzdml where v >= {lo} and v < {hi}"


def _random_ops(rng: random.Random, n: int, next_k: int):
    letters = ["aa", "bb", "cc", "dd"]
    ops = []
    for _ in range(n):
        roll = rng.random()
        if roll < 0.4:
            ops.append(("insert", next_k, rng.choice(letters), float(rng.randrange(0, 50)) / 2))
            next_k += 1
        elif roll < 0.6:
            if rng.random() < 0.5:
                ops.append(("update_v", "k", rng.randrange(0, next_k), float(rng.randrange(0, 100))))
            else:
                ops.append(("update_v", "s", rng.choice(letters), float(rng.randrange(0, 100))))
        elif roll < 0.8:
            ops.append(("update_s", float(rng.randrange(0, 40)), rng.choice(letters)))
        else:
            lo = rng.randrange(0, 30)
            ops.append(("delete", float(lo), float(lo + rng.randrange(1, 15))))
    return ops, next_k


def test_dml_sequences_match_reference_model(spark):
    rng = random.Random(41)
    for trial in range(3):
        eng = Engine(spark)
        seed_rows = [(i, rng.choice(["aa", "bb", "cc", "dd"]), float(i % 17)) for i in range(12)]
        eng.register_dataframe(
            "fuzzdml",
            spark.createDataFrame(seed_rows, "k long, s string, v double"),
        )
        model = {k: {"s": s, "v": v} for k, s, v in seed_rows}
        ops, _ = _random_ops(rng, 12, next_k=100)
        for op in ops:
            eng.command(_op_sql(op))
            _apply_model(model, op)
        got = sorted(
            (r["k"], r["s"], r["v"])
            for r in eng.table("fuzzdml").select("k", "s", "v").collect()
        )
        want = sorted((k, r["s"], r["v"]) for k, r in model.items())
        assert got == want, f"trial {trial}: divergence after {len(ops)} ops\nops={ops}"


def test_graph_crud_sequences_match_adjacency_model(spark):
    """Random link/unlink/delete_vertex sequences vs a Python adjacency
    model: edge multiset and degree views must agree after every-5th op
    and at the end."""
    import random

    from pyspark.sql import functions as F

    from orientdb_spark.graph import Graph

    rng = random.Random(53)
    vids = [f"n{i}" for i in range(8)]
    g = Graph(
        spark.createDataFrame([(v,) for v in vids], ["vid"]),
        spark.createDataFrame([], "src string, dst string, label string"),
    )
    edges: list = []
    alive = set(vids)
    for step in range(15):
        roll = rng.random()
        if roll < 0.55 or not edges:
            s, d = rng.choice(vids), rng.choice(vids)
            g = g.link(s, d, "e")
            edges.append((s, d))
        elif roll < 0.8:
            s, d = rng.choice(edges)
            g = g.unlink(s, d)
            edges = [e for e in edges if e != (s, d)]
        else:
            v = rng.choice(sorted(alive))
            g = g.delete_vertex(v)
            alive.discard(v)
            edges = [(s, d) for s, d in edges if s != v and d != v]
        if step % 5 == 4 or step == 14:
            got_edges = sorted((r["src"], r["dst"]) for r in g.edges.collect())
            assert got_edges == sorted(edges), f"step {step}"
            got_deg = {
                r["vid"]: r["out_degree"] for r in g.out_degrees().collect()
            }
            want_deg: dict = {}
            for s, _ in edges:
                want_deg[s] = want_deg.get(s, 0) + 1
            assert got_deg == want_deg, f"step {step}"


def test_dictionary_sequences_match_dict_model(spark):
    """Random put/remove sequences vs a Python dict: keyset, size, and
    contains_key agree throughout (reference ODictionary semantics —
    put overwrites)."""
    import random

    from orientdb_spark import Engine

    rng = random.Random(61)
    eng = Engine(spark)
    eng.register_dataframe(
        "dictfuzz",
        spark.range(0, 20).selectExpr("id as pk", "concat('r', id) as payload"),
        rid_pos=lambda d: d["pk"],
    )
    model: dict = {}
    keys = [f"key{i}" for i in range(6)]
    cid = eng.catalog.get("dictfuzz").cluster_id
    for step in range(25):
        k = rng.choice(keys)
        if rng.random() < 0.7:
            pos = rng.randrange(0, 20)
            eng.dictionary.put(k, "dictfuzz", (cid, pos))
            model[k] = pos
        else:
            eng.dictionary.remove(k)
            model.pop(k, None)
        assert eng.dictionary.contains_key(k) == (k in model), f"step {step}"
    assert sorted(eng.dictionary.keys()) == sorted(model)
    assert eng.dictionary.size() == len(model)
    for k, pos in model.items():
        rec = eng.dictionary.get_record(k)
        assert rec is not None and rec.collect()[0]["pk"] == pos, k
