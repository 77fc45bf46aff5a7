"""Query catalog: importing this package registers every query.

Each module binds operators from ``burst_db_spark.operators`` to the
synthetic tables (TESTDATA.md) and supplies the DuckDB oracle SQL used by
the driver's correctness gate.

Imports fail soft: a broken module loses its own queries (loudly, on
stderr) instead of taking the whole driver contract down.
"""

from __future__ import annotations

import importlib
import sys

_MODULES = (
    "advanced",
    "composite",
    "core",
    "extra",
    "extra2",
    "extra3",
    "extra4",
    "pipeline_text",
    "scalars",
    "similarity",
    "skewq",
    "spatial",
    "textops",
    "windows",
    "windows2",
)

for _m in _MODULES:
    try:
        importlib.import_module(f"burst_db_spark.queries.{_m}")
    except Exception as e:  # pragma: no cover - defensive
        print(
            f"burst_db_spark.queries.{_m} failed to load: {e!r}",
            file=sys.stderr,
        )
