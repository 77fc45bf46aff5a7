"""CSV robustness: PERMISSIVE mode must capture malformed rows in the
corrupt-record column without failing the scan, DROPMALFORMED must
silently skip them, and FAILFAST must raise — the three contracts a
100 TB ingest of dirty CSVs depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException


@pytest.fixture()
def dirty_csv(tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,price\n"
        "1,10,1.50\n"
        "2,notanumber,2.25\n"  # qty fails int parse
        "3,30,3.75\n"
        "4,40,bogus\n"  # price fails double parse
        "5,50,5.00\n"
    )
    return str(p)


SCHEMA = "id INT, qty INT, price DOUBLE, _corrupt_record STRING"


def test_permissive_captures_corrupt_rows(spark, dirty_csv):
    df = (
        spark.read.schema(SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dirty_csv)
    ).cache()  # SPARK-21610: can't filter on the corrupt column alone
    try:
        assert df.count() == 5  # no row lost
        corrupt = df.where(F.col("_corrupt_record").isNotNull()).collect()
        assert sorted(r.id for r in corrupt) == [2, 4]
        # corrupt rows keep the parseable cells, null the broken one
        by_id = {r.id: r for r in corrupt}
        assert by_id[2].qty is None and by_id[2].price == 2.25
        assert by_id[4].qty == 40 and by_id[4].price is None
        # raw line preserved for quarantine/replay
        assert by_id[2]._corrupt_record == "2,notanumber,2.25"
        good = df.where(F.col("_corrupt_record").isNull())
        assert good.count() == 3
        assert good.agg(F.sum("qty")).first()[0] == 90
    finally:
        df.unpersist()


def test_dropmalformed_skips_corrupt_rows(spark, dirty_csv):
    df = (
        spark.read.schema("id INT, qty INT, price DOUBLE")
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(dirty_csv)
    )
    assert sorted(r.id for r in df.collect()) == [1, 3, 5]


def test_failfast_raises_on_corrupt_row(spark, dirty_csv):
    df = (
        spark.read.schema("id INT, qty INT, price DOUBLE")
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(dirty_csv)
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
