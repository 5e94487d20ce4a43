"""Data-contract validation: declarative expectations, functional
dependencies, and order-insensitive table digests.

The 2010 reference has no data-quality surface; these are the
Spark-first formulations of the warehouse contract checks (the
dbt-test / expectations family) a 100 TB ingest pipeline runs before
promoting a snapshot:

- ``validate_expectations`` — a rule list compiles to ONE aggregate
  pass over the table (every rule is a conditional count), so checking
  ten contracts costs one scan, not ten. ``unique`` rules need a
  distinct count and ride the same aggregate via approx-free
  count_distinct.
- ``fd_violations`` — does column A functionally determine column B?
  One (A)-groupBy counting distinct B per key; violating keys have
  more than one.
- ``table_digest`` — an order- and partition-insensitive content hash:
  per-row md5-derived 60-bit hash of the canonical row string, summed
  (unsigned, mod 2^60) — commutative, so any row order / partitioning /
  engine produces the same digest, and two snapshots can be compared
  by exchanging ONE number. Collision probability for n rows is
  ~n^2/2^61 (birthday bound on the sum) — fine for drift DETECTION,
  not an integrity proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from orientdb_spark.pipeline.common import h60

__all__ = ["validate_expectations", "fd_violations", "table_digest"]

_DIGEST_MOD = 1 << 60


def validate_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Check declarative expectations in ONE aggregate pass.

    Each rule is a dict with ``kind`` plus kind-specific keys:
      - ``{"kind": "not_null", "col": c}``
      - ``{"kind": "unique", "col": c}`` — nulls don't count as dupes
      - ``{"kind": "in_range", "col": c, "lo": x, "hi": y}`` (inclusive;
        nulls violate — range implies presence)
      - ``{"kind": "accepted_values", "col": c, "values": [...]}``
        (nulls violate)
      - ``{"kind": "not_null_when", "col": c, "when_col": w,
        "when_value": x}`` — c must be present on rows where w = x
        (the cross-column conditional: "shipped orders have a ship
        date"); rows where w != x or w is null are exempt

    Returns one row per rule: ``(rule, passed, n_violations)`` where
    ``rule`` is a stable human-readable label.
    """
    if not rules:
        raise ValueError("validate_expectations needs at least one rule")
    aggs = []
    labels = []
    for r in rules:
        kind = r.get("kind")
        col = r.get("col")
        if col not in df.columns:
            raise ValueError(f"unknown column in rule: {r}")
        c = F.col(col)
        if kind == "not_null":
            label = f"not_null({col})"
            viol = F.sum(c.isNull().cast("long"))
        elif kind == "unique":
            label = f"unique({col})"
            viol = (
                F.count(c) - F.count_distinct(c)
            ).cast("long")
        elif kind == "in_range":
            lo, hi = r["lo"], r["hi"]
            label = f"in_range({col},{lo},{hi})"
            ok = (c >= F.lit(lo)) & (c <= F.lit(hi))
            viol = F.sum((~F.coalesce(ok, F.lit(False))).cast("long"))
        elif kind == "accepted_values":
            vals = list(r["values"])
            label = f"accepted_values({col})"
            ok = c.isin(vals)
            viol = F.sum((~F.coalesce(ok, F.lit(False))).cast("long"))
        elif kind == "not_null_when":
            wcol, wval = r["when_col"], r["when_value"]
            if wcol not in df.columns:
                raise ValueError(f"unknown column in rule: {r}")
            label = f"not_null_when({col},{wcol}={wval})"
            applies = F.coalesce(F.col(wcol) == F.lit(wval), F.lit(False))
            viol = F.sum((applies & c.isNull()).cast("long"))
        else:
            raise ValueError(f"unknown rule kind: {r}")
        labels.append(label)
        # F.sum over zero rows is NULL — coalesce so an empty table
        # yields n_violations=0, passed=true (the vacuous-truth verdict
        # a promotion gate needs), not NULL/NULL.
        aggs.append(
            F.coalesce(viol, F.lit(0)).cast("long").alias(f"__v{len(aggs)}")
        )
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("rule"), F.col(f"__v{i}").alias("n_violations")
            )
            for i, lbl in enumerate(labels)
        ]
    )
    return row.select(F.explode(pairs).alias("__r")).select(
        F.col("__r.rule").alias("rule"),
        (F.col("__r.n_violations") == 0).alias("passed"),
        F.col("__r.n_violations").alias("n_violations"),
    )


def fd_violations(df: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Functional-dependency audit ``lhs -> rhs``: keys of ``lhs`` that
    map to more than one distinct ``rhs`` value (nulls count as a
    value). One groupBy on the determinant. Returns the violating keys
    as ``(lhs, n_rhs_values)`` — empty means the dependency holds."""
    for c in (lhs, rhs):
        if c not in df.columns:
            raise ValueError(f"unknown column: {c}")
    nd = F.count_distinct(
        F.coalesce(F.col(rhs).cast("string"), F.lit("\0"))
    )
    return (
        df.groupBy(lhs)
        .agg(nd.alias("n_rhs_values"))
        .filter(F.col("n_rhs_values") > 1)
    )


def table_digest(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order/partitioning-insensitive content digest: per row,
    h60 of the canonical ``|``-joined string of the selected columns,
    summed mod 2^60. Identical multisets of rows — in any order, any
    partitioning, either engine — give identical digests. Returns one
    row ``(n_rows, digest)``.

    Canonical form: per field, escape the escape char first
    (``\\`` -> ``\\\\``) then the separator (``|`` -> ``\\|``); NULL is
    the field ``\\N`` — unreachable by escaped data, since every data
    backslash is doubled, so a single ``\\`` followed by ``N`` can only
    mean NULL. This makes the encoding injective (a literal ``\\N``
    value encodes as ``\\\\N``), closing the collision the bare
    pipe-escape had."""
    cols = cols or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns absent: {missing}")
    canon = F.concat_ws(
        "|",
        *[
            F.coalesce(
                F.regexp_replace(
                    F.regexp_replace(F.col(c).cast("string"), r"\\", r"\\\\"),
                    r"\|",
                    r"\\|",
                ),
                F.lit("\\N"),
            )
            for c in cols
        ],
    )
    # sum in decimal(38,0): 60-bit terms overflow BIGINT after a handful
    # of rows (DuckDB's sum auto-widens to 128-bit; Spark needs the cast)
    total = F.sum(h60(canon).cast("decimal(38,0)"))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (total % F.lit(_DIGEST_MOD)).cast("long").alias("digest"),
    )
