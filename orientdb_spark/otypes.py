"""OType → Spark SQL type mapping.

Reproduces the 18-entry scalar/container type system of the reference
(core:metadata/schema/OType.java:38-73); mapping table documented in
SURVEY.md §1.2. LINK* types carry a ``linked_class`` at the property level
(core:metadata/schema/OProperty.java) — represented here as plain type tags;
the catalog stores the linked-class name beside them.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T


class OType(Enum):
    BOOLEAN = 0
    INTEGER = 1
    SHORT = 2
    LONG = 3
    FLOAT = 4
    DOUBLE = 5
    DATE = 6
    STRING = 7
    BINARY = 8
    EMBEDDED = 9
    EMBEDDEDLIST = 10
    EMBEDDEDSET = 11
    EMBEDDEDMAP = 12
    LINK = 13
    LINKLIST = 14
    LINKSET = 15
    LINKMAP = 16
    BYTE = 17


# RID = <cluster-id>:<cluster-position> (core:id/ORecordId.java). We
# materialize RIDs as a struct column so range scans / pruning work on it.
RID_TYPE = T.StructType(
    [
        T.StructField("cluster", T.IntegerType(), False),
        T.StructField("pos", T.LongType(), False),
    ]
)

_SCALARS: dict[OType, T.DataType] = {
    OType.BOOLEAN: T.BooleanType(),
    OType.INTEGER: T.IntegerType(),
    OType.SHORT: T.ShortType(),
    OType.LONG: T.LongType(),
    OType.FLOAT: T.FloatType(),
    OType.DOUBLE: T.DoubleType(),
    OType.DATE: T.TimestampType(),
    OType.STRING: T.StringType(),
    OType.BINARY: T.BinaryType(),
    OType.BYTE: T.ByteType(),
    OType.LINK: RID_TYPE,
}


def spark_type(otype: OType, element: T.DataType | None = None) -> T.DataType:
    """Spark type for an OType; ``element`` types containers."""
    if otype in _SCALARS:
        return _SCALARS[otype]
    if otype in (OType.EMBEDDEDLIST, OType.EMBEDDEDSET):
        return T.ArrayType(element or T.StringType())
    if otype is OType.EMBEDDEDMAP:
        return T.MapType(T.StringType(), element or T.StringType())
    if otype in (OType.LINKLIST, OType.LINKSET):
        return T.ArrayType(RID_TYPE)
    if otype is OType.LINKMAP:
        return T.MapType(T.StringType(), RID_TYPE)
    if otype is OType.EMBEDDED:
        return element or T.StringType()
    raise ValueError(f"unmapped OType: {otype}")
