"""Unit tests for round-8/9 operator edge cases not reachable from the
synthetic corpus: short-document substring containment, empty-set
theta counts, and the two-pass MAD median helper."""

from __future__ import annotations

from pyspark.sql import functions as F

from burst_db_spark.queries.round8 import contained_doc_ids


def test_substring_dedup_short_doc_probe(spark):
    """A doc shorter than the 12-char gram width must still be found
    inside a longer container (direct broadcast probe path)."""
    docs = spark.createDataFrame(
        [
            (1, "tiny str"),                      # len 8 < 12, inside 3
            (2, "completely unrelated content here"),
            (3, "prefix tiny str suffix padding"),  # contains doc 1
            (4, "prefix tiny str suffix padding more"),  # contains 1 and 3
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["contained_in_min"], r["n_containers"])
        for r in contained_doc_ids(docs).collect()
    }
    assert got[1] == (3, 2)   # short doc found in 3 and 4
    assert got[3] == (4, 1)   # anchored path still works
    assert 2 not in got and 4 not in got
