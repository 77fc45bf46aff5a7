"""Scan layer (SURVEY.md §2.1 S1-S11): CSV (inferred/explicit/glob),
Parquet, JSON document envelopes, zipped JSON, XML via mapInPandas,
JDBC stub. Sinks live in burst_db_spark.sinks."""
