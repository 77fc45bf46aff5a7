"""burst_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of opera-adt/burst_db.

The reference system (see /root/reference, SURVEY.md) is a metadata-catalog
build + query system executing on pandas/GeoPandas, SQLite/SpatiaLite and
DuckDB.  This package re-expresses every operator in its inventory
(SURVEY.md §2) as idiomatic Spark DataFrame/SQL transformations:

- ``catalog``    — table schemas + loaders for the synthetic star schema
- ``session``    — tuned SparkSession builder (AQE, Arrow, UTC)
- ``operators``  — composable ``DataFrame -> DataFrame`` operator library
- ``functions``  — scalar expression helpers (string/date/math/conditional)
- ``geo``        — pure-python geo kernel (WKT, bbox, predicates) as pandas UDFs
- ``sources``    — scan layer (csv/parquet/json documents/xml)
- ``plans``      — pipelines mirroring the reference entry points (EP1-EP3)
- ``streaming``  — Structured Streaming analogs of the incremental workflows
- ``queries``    — the registered query catalog checked against a DuckDB oracle
"""

__version__ = "0.1.0"

from burst_db_spark.session import get_spark  # noqa: F401
