"""Query catalog: importing this package registers every query.

Each module binds operators from ``burst_db_spark.operators`` to the
synthetic tables (TESTDATA.md) and supplies the DuckDB oracle SQL used by
the driver's correctness gate.
"""

from burst_db_spark.queries import (  # noqa: F401
    advanced,
    composite,
    core,
    extra,
    extra2,
    extra3,
    extra4,
    pipeline_text,
    scalars,
    similarity,
    skewq,
    spatial,
    textops,
    windows,
    windows2,
)
