"""CSV scans (S2-S4).

- S2 inferred schema (duckdb read_csv_auto analog,
  create_cslc_burst_catalog.py:77) — convenient, but at 100 TB inference
  costs an extra pass; prefer explicit schemas in production paths.
- S3 explicit schema + custom delimiter (the semicolon historical-burst
  CSVs, export_denormalized_db.py:44-55)
- S4 glob multi-file scan (full_frame*.csv union,
  create_cslc_burst_catalog.py:272-282) — native in Spark; each file
  becomes ≥1 partition, no manual union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

HISTORICAL_BURSTS_SCHEMA = (
    "burst_id_jpl string, sensing_time timestamp, geometry string, granule string"
)


def read_csv_inferred(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """S2: full-sample schema inference."""
    return (
        spark.read.option("header", header)
        .option("inferSchema", True)
        .csv(path)
    )


def read_csv_schema(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """S3: explicit schema, custom delimiter — no inference pass."""
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", header)
        .csv(path)
    )


def read_historical_bursts(spark: SparkSession, glob: str) -> DataFrame:
    """S3+S4: the semicolon-delimited per-date burst CSVs
    (parse_bursts.py:54-56,733-748), globbed."""
    return read_csv_schema(spark, glob, HISTORICAL_BURSTS_SCHEMA, sep=";")
