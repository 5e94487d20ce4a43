#!/usr/bin/env python
"""Synthetic-testdata generator for scale factors the driver does not
ship (the driver provides read-only sf0.001/0.01/0.1; this produces the
same schema at larger SFs for scaling benchmarks — see BENCH.md's sf1
section).

Distribution-matched to the shipped parquet (measured on sf0.1):
same physical types, key ranges, category sets, value ranges, ascending
event timestamps, ASCII document texts over the 31-word vocabulary with
a small planted duplicate/near-duplicate population, unit-normalized
float32 embeddings with 10 labels. Row counts scale linearly from
sf0.1's (customer 150k/sf, lineitem 6M/sf, events 1M/sf, documents
50k/sf, embeddings 20k/sf; region/nation fixed).

Deterministic (numpy PCG64 seeded per table), so benchmark runs are
reproducible. Usage:

    python tools/gen_sf.py 1.0 /tmp/sf1
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
FLAGS = ["N", "A", "R"]
LINESTATUS = ["O", "F"]
ETYPES = ["view", "click", "purchase", "signup", "error"]
PTYPE = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
PADJ = ["large", "small", "hot", "cold", "red", "blue", "green", "shiny"]
PNOUN = ["ring", "bolt", "screw", "washer", "nut", "gear", "pin", "cap"]
LANGS = ["en", "en", "en", "en", "de", "es", "fr", "zh"]  # en-heavy like sf0.1
VOCAB = (
    "spark line column order small sort fast value scan a hash slow group "
    "batch agg filter query big key window row part table stream merge data "
    "vector join index page"
).split()  # 31 words, matching the shipped corpus vocabulary size

DAY_US = 86_400_000_000


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def _write(path: str, name: str, **cols) -> None:
    pq.write_table(pa.table(dict(cols)), f"{path}/{name}.parquet")
    print(f"{name}: {len(next(iter(cols.values())))} rows")


def generate(sf: float, out_dir: str) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)

    # region / nation (fixed small dims)
    _write(
        out_dir,
        "region",
        r_regionkey=pa.array(range(5), pa.int32()),
        r_name=pa.array(REGIONS),
    )
    rng = np.random.default_rng(4201)
    _write(
        out_dir,
        "nation",
        n_nationkey=pa.array(range(25), pa.int32()),
        n_name=pa.array([f"NATION_{i}" for i in range(25)]),
        n_regionkey=pa.array((np.arange(25) % 5).astype("int32")),
    )

    rng = np.random.default_rng(4202)
    _write(
        out_dir,
        "customer",
        c_custkey=pa.array(np.arange(n_cust, dtype="int64")),
        c_name=pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        c_nationkey=pa.array(rng.integers(0, 25, n_cust).astype("int32")),
        c_acctbal=pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        c_mktsegment=pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    )

    rng = np.random.default_rng(4203)
    _write(
        out_dir,
        "supplier",
        s_suppkey=pa.array(np.arange(n_supp, dtype="int64")),
        s_name=pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        s_nationkey=pa.array(rng.integers(0, 25, n_supp).astype("int32")),
        s_acctbal=pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
    )

    rng = np.random.default_rng(4204)
    adj = np.array(PADJ)[rng.integers(0, len(PADJ), n_part)]
    noun = np.array(PNOUN)[rng.integers(0, len(PNOUN), n_part)]
    _write(
        out_dir,
        "part",
        p_partkey=pa.array(np.arange(n_part, dtype="int64")),
        p_name=pa.array(np.char.add(np.char.add(adj, " "), noun)),
        p_brand=pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        p_type=pa.array(np.array(PTYPE)[rng.integers(0, len(PTYPE), n_part)]),
        p_size=pa.array(rng.integers(1, 51, n_part).astype("int32")),
        p_retailprice=pa.array(np.round(900 + np.arange(n_part) * 0.1 % 200, 2)),
    )

    rng = np.random.default_rng(4205)
    base_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype("int64")
    odate = base_1995 + rng.integers(0, 2404, n_orders) * DAY_US
    _write(
        out_dir,
        "orders",
        o_orderkey=pa.array(np.arange(n_orders, dtype="int64")),
        o_custkey=pa.array(rng.integers(0, n_cust, n_orders)),
        o_orderstatus=pa.array(np.array(STATUSES)[rng.integers(0, 3, n_orders)]),
        o_totalprice=pa.array(np.round(rng.uniform(1000, 500_000, n_orders), 2)),
        o_orderdate=_ts_col(odate),
        o_orderpriority=pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]),
    )

    rng = np.random.default_rng(4206)
    lok = rng.integers(0, n_orders, n_line)
    sdate = base_1995 + rng.integers(1, 2500, n_line) * DAY_US
    _write(
        out_dir,
        "lineitem",
        l_orderkey=pa.array(lok),
        l_partkey=pa.array(rng.integers(0, n_part, n_line)),
        l_suppkey=pa.array(rng.integers(0, n_supp, n_line)),
        l_linenumber=pa.array((rng.integers(1, 8, n_line)).astype("int32")),
        l_quantity=pa.array(rng.integers(1, 51, n_line).astype("float64")),
        l_extendedprice=pa.array(np.round(rng.uniform(900, 105_000, n_line), 2)),
        l_discount=pa.array(np.round(rng.integers(0, 11, n_line) / 100.0, 2)),
        l_tax=pa.array(np.round(rng.integers(0, 9, n_line) / 100.0, 2)),
        l_returnflag=pa.array(np.array(FLAGS)[rng.integers(0, 3, n_line)]),
        l_linestatus=pa.array(np.array(LINESTATUS)[rng.integers(0, 2, n_line)]),
        l_shipdate=_ts_col(sdate),
    )

    rng = np.random.default_rng(4207)
    base_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype("int64")
    gaps = rng.exponential(30 * DAY_US / n_events, n_events).astype("int64")
    ets = base_2024 + np.cumsum(gaps)  # ascending with event_id, like sf0.1
    _write(
        out_dir,
        "events",
        event_id=pa.array(np.arange(n_events, dtype="int64")),
        ts=_ts_col(ets),
        user_id=pa.array(rng.integers(0, n_users, n_events)),
        event_type=pa.array(np.array(ETYPES)[rng.integers(0, 5, n_events)]),
        value=pa.array(np.round(np.abs(rng.normal(50, 60, n_events)), 2)),
        props=pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)]),
    )

    rng = np.random.default_rng(4208)
    vocab = np.array(VOCAB)
    n_words = rng.integers(8, 100, n_docs)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in n_words
    ]
    # planted duplicate structure (the shipped corpus carries a small
    # exact-dup population): ~0.2% exact copies + ~1% near-copies
    # (one word changed) so dedup operators have real work at scale
    for i in range(0, n_docs, 500):
        if i + 1 < n_docs:
            texts[i + 1] = texts[i]
    # start at 57 so targets (i-7 ≡ 50 mod 100) never hit the 500-stride
    # exact-dup sources (≡0 mod 500) or copies (≡1 mod 500) planted above
    for i in range(57, n_docs, 100):
        w = texts[i].split()
        w[rng.integers(0, len(w))] = vocab[rng.integers(0, len(vocab))]
        texts[i - 7] = " ".join(w)
    _write(
        out_dir,
        "documents",
        doc_id=pa.array(np.arange(n_docs, dtype="int64")),
        text=pa.array(texts),
        lang=pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_docs)]),
        source=pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
        n_chars=pa.array(np.array([len(t) for t in texts], dtype="int64")),
    )

    rng = np.random.default_rng(4209)
    vecs = rng.normal(0, 1, (n_vecs, 64)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # planted near-duplicates: every 250th vector reappears slightly
    # perturbed so cosine near-dup mining finds real pairs
    for i in range(0, n_vecs - 1, 250):
        vecs[i + 1] = vecs[i] + rng.normal(0, 0.01, 64).astype("float32")
        vecs[i + 1] /= np.linalg.norm(vecs[i + 1])
    _write(
        out_dir,
        "embeddings",
        vec_id=pa.array(np.arange(n_vecs, dtype="int64")),
        embedding=pa.array(list(vecs), pa.list_(pa.float32())),
        label=pa.array(rng.integers(0, 10, n_vecs).astype("int32")),
    )


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf{sys.argv[1] if len(sys.argv) > 1 else '1'}"
    generate(sf, out)
