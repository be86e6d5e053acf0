"""Query registry: the engine's declared operator inventory.

Every operator from SURVEY.md §2.C registers here via the ``@query``
decorator with (a) a Spark implementation ``(spark, sf_dir) ->
DataFrame`` and (b) where SQL-expressible, a DuckDB oracle SQL string
used by the driver's differential-correctness gate. Column names are
the contract: every computed column is aliased identically in both.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB ANSI SQL, or None -> rows-only check
    doc: str


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn
    return deco


def _ensure_loaded() -> None:
    # Operator modules self-register on import.
    import lisp_batch_processor_spark.operators  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in sorted(_REGISTRY.items())}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {n: s.oracle for n, s in sorted(_REGISTRY.items()) if s.oracle}


def spec(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]
