"""r10 blocking study: n_cells="auto" (√N, guard-backed) vs the 16-cell
default on the two r9 study corpora (BENCH.md "Round 9" section) —
clustered 60k (60 tight clusters) and isotropic 60k. The r9 verdict's
"Done" bar: auto ≥ flat-16 on BOTH corpora, bit-identical output;
default flips only if both regimes win or tie.

    python tools/study_autocells.py [n_rows]
"""

from __future__ import annotations

import math
import random
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from orientdb_spark import get_spark  # noqa: E402
from orientdb_spark.pipeline import dedup  # noqa: E402


def unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def clustered(n, n_clusters=60, dim=32, seed=7):
    rng = random.Random(seed)
    centers = [unit([rng.gauss(0, 1) for _ in range(dim)]) for _ in range(n_clusters)]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        rows.append((i, unit([x + rng.gauss(0, 0.02) for x in c])))
    return rows


def isotropic(n, dim=32, seed=8):
    rng = random.Random(seed)
    return [(i, unit([rng.gauss(0, 1) for _ in range(dim)])) for i in range(n)]


def run(df, threshold, n_cells):
    t0 = time.perf_counter()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = dedup.embedding_duplicate_pairs(
            df, block_col=None, threshold=threshold, n_cells=n_cells
        )
        cnt = out.count()
    return time.perf_counter() - t0, cnt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    spark = get_spark(app_name="study_autocells")
    spark.sparkContext.setLogLevel("ERROR")
    for label, rows, threshold in (
        ("clustered", clustered(n), 0.9),
        ("isotropic", isotropic(n), 0.3),
    ):
        df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
        df.count()
        for cells in (16, "auto"):
            times, counts = [], []
            for _ in range(2):
                dt, cnt = run(df, threshold, cells)
                times.append(dt)
                counts.append(cnt)
            print(
                f"{label} n={n} cells={cells}: min {min(times):.1f} s "
                f"(runs {[round(t,1) for t in times]}), pairs {counts[0]}",
                flush=True,
            )
            assert len(set(counts)) == 1
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
