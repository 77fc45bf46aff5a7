"""Query registry: every implemented operator registers a named query that
runs on the synthetic tables, plus (when SQL-expressible) the equivalent
ANSI SQL a DuckDB oracle can run on the same parquet — the correctness gate
described in ``__spark_entry__.py``.

Contract notes (from the driver):
- column names must match between Spark result and oracle result;
- the compare is order-insensitive (values are hashed after sorting), but
  the row *set* must be deterministic — no LIMIT without a total order, no
  arbitrary-row dedup, no nondeterministic first()/collect order.

Caching contract (r13 ADVICE): query builders MAY ``persist()``
intermediates that the returned plan references more than once
(iterative fixpoints, reused edge/score frames — e.g. round9's kept*
chain, g5_hits_unrolled's edges, t_gopher_ablation's scored). Those
frames CANNOT be unpersisted inside the builder — the caller's action
has not run yet — so the contract is: run queries through bench.py /
the driver / tests, which call ``spark.catalog.clearCache()`` between
queries. A direct library caller that builds many queries on one
session without clearing the cache will accumulate cached frames and
should call ``clearCache()`` (or ``unpersist()`` the returned plan's
sources) itself after each action.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Explicit ordering prefix: names listed here come first in all_queries()
# (the driver's correctness gate samples a prefix of the registration
# order, so load-bearing / not-yet-driver-verified queries go first).
_ORDER_PREFIX: tuple[str, ...] = ()


def set_order_prefix(names: Sequence[str]) -> None:
    global _ORDER_PREFIX
    _ORDER_PREFIX = tuple(names)


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for side effect: query modules self-register on import.
    import burst_db_spark.queries  # noqa: F401

    out: dict[str, QuerySpec] = {}
    for n in _ORDER_PREFIX:
        if n in _REGISTRY:
            out[n] = _REGISTRY[n]
    for n, spec in _REGISTRY.items():
        if n not in out:
            out[n] = spec
    return out
