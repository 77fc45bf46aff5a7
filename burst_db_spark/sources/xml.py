"""S9 — XML annotation scan via binaryFile + mapInPandas.

The reference parses Sentinel-1 SAFE annotation XML (burst lists,
geolocation grids; parse_bursts.py:249-363) with lxml on the driver. The
Spark-native shape: read files as binary, parse per-partition with the
stdlib ElementTree inside mapInPandas — each file parses where its bytes
land, no driver bottleneck, schema declared up front.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

BURST_ROW_SCHEMA = (
    "path string, burst_index int, azimuth_time string, byte_offset long"
)


def read_annotation_bursts(spark: SparkSession, path_glob: str) -> DataFrame:
    """Parse ``<burst>`` elements out of annotation XML files.

    Expected element shape (subset of the SAFE annotation):
    ``<burst><azimuthTime>...</azimuthTime><byteOffset>...</byteOffset>
    </burst>`` under any nesting.
    """
    binary = spark.read.format("binaryFile").load(path_glob)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    root = ET.fromstring(bytes(content))
                except ET.ParseError:
                    continue
                for i, burst in enumerate(root.iter("burst")):
                    az = burst.findtext("azimuthTime")
                    off = burst.findtext("byteOffset")
                    rows.append(
                        {
                            "path": path,
                            "burst_index": i,
                            "azimuth_time": az,
                            "byte_offset": int(off) if off else None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["path", "burst_index", "azimuth_time", "byte_offset"],
            )

    return binary.select("path", "content").mapInPandas(_parse, BURST_ROW_SCHEMA)
