"""Query catalog: single source of truth for the driver contract.

Every operator claimed done in SURVEY.md §2 is registered here exactly once,
as a Spark callable plus (when SQL-expressible) a DuckDB oracle SQL string.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry, which guarantees the two stay in sync.

Conventions that make the driver's order-insensitive value-hash match:

* every computed/aggregate column is aliased IDENTICALLY in Spark and SQL;
* floating aggregates are rounded (money 2 dp, ratios/similarities 4 dp) on
  BOTH sides, so differing fp summation order can't flip a hash;
* integer-typed aggregates are cast so Spark LongType == DuckDB BIGINT
  (DuckDB sum(INTEGER) yields HUGEINT, window ranks yield BIGINT — both
  normalized explicitly);
* timestamps are computed under UTC session timezone (see session.tune).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {n: q.fn for n, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every catalog module exactly once (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    from . import analytics  # noqa: F401
    from . import windows  # noqa: F401
    from . import joins  # noqa: F401
    from . import setops  # noqa: F401
    from . import events  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import vector  # noqa: F401
    from . import pipeline_ops  # noqa: F401
    from . import stats  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import streaming_queries  # noqa: F401
    _LOADED = True
