"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as a ``QuerySpec``:
a name (the §2 "query key"), a Spark callable ``(spark, sf_dir) ->
DataFrame``, and (for SQL-oracled keys) the equivalent DuckDB SQL.
``__spark_entry__.py``'s ``queries()`` / ``oracle_sql()`` and the local
verify harness (tools/verify_local.py) all read from this one dict.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def _load_all_operators() -> None:
    """Import every operator module so registration side-effects run."""
    import ezbake_graph_spark.operators  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all_operators()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all_operators()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
