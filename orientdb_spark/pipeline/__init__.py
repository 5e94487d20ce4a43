"""Large-scale training-data pipeline operators (beyond the reference's own
surface — SURVEY §7 step 9 / driver north-star): deduplication, similarity
search, text analysis, multimodal column plumbing.

Every operator is partition-parallel (no driver-side materialization) and
built from JVM-side built-in functions wherever possible; Pandas UDFs only
where Spark genuinely lacks the primitive (multimodal byte decoding).
"""

from orientdb_spark.pipeline import (
    dedup,
    multimodal,
    profile,
    quantize,
    sampling,
    similarity,
    text,
)

__all__ = [
    "dedup",
    "multimodal",
    "profile",
    "quantize",
    "sampling",
    "similarity",
    "text",
]
