"""Mirror of the driver's correctness harness: run every queries() entry
at sf0.001 and compare rows/schema/values against its oracle_sql() twin.
Catching a mismatch here means catching it before CORRECTNESS_r{N}.json.

The FULL 279-entry mirror takes ~1.5 h (it is the bulk of the old 1:26 h
suite) and made the r13 driver verify time out (VERIFY_r13 tests_ok:
false with zero failures — the run simply never finished). Default runs
therefore mirror only a cross-family smoke subset; set
``SPARK_GRAFT_FULL_ORACLE=1`` to run every entry (do this before
shipping any change that touches an operator's results)."""

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

FULL_ORACLE = os.environ.get("SPARK_GRAFT_FULL_ORACLE") == "1"

# Default smoke subset: one-per-family over the operator surfaces (SQL
# agg/join/window/set, traverse, graph, events, dedup, ANN, text, sampling,
# profile) so a broken shared primitive still fails fast without the flag.
ORACLE_SMOKE = [
    "tpch_q1_pricing",
    "tpch_q5_local_supplier",
    "link_nav_2hop",
    "window_rank_topn",
    "set_operations",
    "traverse_reachability",
    "graph_pagerank",
    "graph_connected_components",
    "event_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_topk_mmr",
    "sim_bitext_mine",
    "text_quality_score",
    "text_bm25_topk",
    "sample_dsir",
    "sample_domain_reweight",
    "profile_dataset_card",
]

_MIRROR_NAMES = (
    sorted(ORACLES.keys())
    if FULL_ORACLE
    else [n for n in ORACLE_SMOKE if n in ORACLES]
)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "l_returnflag" in df.columns


def test_oracle_keys_subset():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle entries without queries: {missing}"


def test_oracle_smoke_names_are_valid():
    """The smoke list must track registry renames: a stale name here
    would silently shrink default-mode mirror coverage."""
    missing = set(ORACLE_SMOKE) - set(ORACLES)
    assert not missing, f"ORACLE_SMOKE names without oracles: {sorted(missing)}"


@pytest.mark.parametrize("name", _MIRROR_NAMES)
def test_query_vs_oracle(spark, oracle, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, oracle, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_queries_run(spark, name):
    # weaker rows-only check, like the driver
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_lsh_recall_vs_bruteforce(spark):
    """The approximate ANN path must find a meaningful fraction of the
    true neighbors (quality gate for the no-oracle query)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["sim_topk_bruteforce"](spark, SF_DIR).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["sim_topk_lsh"](spark, SF_DIR).collect()
    }
    assert approx, "LSH returned nothing"
    # 6-table multi-probe LSH must recover well over half the true top-k
    # (measured 0.80 at sf0.001 / 0.88 at sf0.01 — the 0.65 gate leaves
    # real margin yet still catches a silent recall regression that the
    # old 0.5 gate would have let slide)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.65, f"LSH recall too low: {recall:.2f}"
    # multi-probe (own bucket + lowest-margin flips) must not lose recall
    # vs single-probe — deterministic on the fixture (hash-derived planes)
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline import similarity as _sim

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in _sim.lsh_topk(
            embs, embs.filter(F.col("vec_id") < 10), k=5, planes=5, nprobe=1
        ).collect()
    }
    assert len(exact & approx) >= len(exact & single)


def test_ivf_recall_vs_bruteforce(spark):
    """The derived-parameter IVF entry (refine_iters=0 since its r11
    oracle upgrade) must still recover most true neighbors — the recall
    gate stays alongside the exact replay so a parameter-derivation
    regression can't hide behind a bit-identical oracle."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["sim_topk_bruteforce"](spark, SF_DIR).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in QUERIES["sim_topk_ivf"](spark, SF_DIR).collect()
    }
    assert approx, "IVF returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_fingerprint_and_simhash_duplicate_groups(spark):
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline import dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),   # same after normalization
            (3, "something else entirely"),
            (4, "Hello, World!"),
        ],
        ["doc_id", "text"],
    )
    groups = dedup.fingerprint_duplicate_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 3 and groups[0]["canonical_id"] == 1

    pairs = dedup.simhash_duplicate_pairs(docs).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    # byte-identical token sets share a simhash (1 and 4); doc 2 differs
    # in case/punctuation — the whitespace tokenizer keeps it distinct
    assert (1, 4) in ids and (1, 2) not in ids


def test_bench_headline_names_are_valid():
    """A renamed entry must fail CI, not the driver's bench run."""
    import bench

    missing = set(bench.HEADLINE) - set(QUERIES)
    assert not missing, f"bench.HEADLINE names unknown queries: {sorted(missing)}"


def test_driver_front_slots_all_oracle_bearing():
    """Rotation contract, r9 form: the refresh rotation deliberately
    slots rows-only-by-design entries — those exact entries (and only
    those) may lack oracles; any other oracle-less slot (a rename, an
    oracle drop) must fail CI, not the driver run. Note sim_topk_ivfpq
    / sim_topk_lsh / sim_topk_imi are NOT here (r9 upgraded all three
    to oracle-exact deterministic replays), and neither are
    sim_topk_ivf / embedding_kmeans / text_bpe_merges (r11 did the
    same for the whole derivable tail — only the two permanent
    rows-only entries remain)."""
    ROWS_ONLY_BY_DESIGN = {
        "embedding_pca",          # LAPACK eigenbasis; numpy-agreement-gated
        "approx_distinct_parts",  # approxCountDistinct dialect surface
    }
    front = list(QUERIES)[:50]
    assert len(front) == 50
    missing = [n for n in front if n not in ORACLES and n not in ROWS_ONLY_BY_DESIGN]
    assert not missing, f"front-50 slots without oracles: {missing}"
    # and the exception list itself stays honest: each is really in the
    # registry and really lacks an oracle
    for n in ROWS_ONLY_BY_DESIGN:
        assert n in QUERIES and n not in ORACLES, n
