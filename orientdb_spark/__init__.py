"""orientdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Spaceghost/OrientDB (the original 2010
OrientDB codebase).

This is NOT a port of the reference's Java execution machinery: queries are
compiled to PySpark DataFrame plans and Catalyst/Tungsten own the physical
execution (pushdown, pruning, join strategy, codegen, spill).

Public surface:

    from orientdb_spark import Engine

    eng = Engine(spark)
    eng.register_parquet_dir("/root/testdata/sf0.01")
    df = eng.sql("select l_returnflag, sum(l_quantity) as sum_qty "
                 "from lineitem group by l_returnflag")

Reference parity map lives in SURVEY.md; each module cites the reference
files (file:line) whose *behavior* it reproduces.
"""

from orientdb_spark.engine import Engine
from orientdb_spark.catalog import Catalog, OClass, OProperty
from orientdb_spark.graph import Graph
from orientdb_spark.native import ONativeAsynchQuery, ONativeSynchQuery, OQueryContextNative
from orientdb_spark.operators import register_operator, unregister_operator
from orientdb_spark.session import get_spark
from orientdb_spark.synchquery import OSQLSynchQuery

__all__ = [
    "Engine",
    "Catalog",
    "OClass",
    "OProperty",
    "Graph",
    "OQueryContextNative",
    "ONativeSynchQuery",
    "ONativeAsynchQuery",
    "get_spark",
    "register_operator",
    "unregister_operator",
    "OSQLSynchQuery",
]

__version__ = "0.1.0"
