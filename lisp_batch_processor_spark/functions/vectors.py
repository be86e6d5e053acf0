"""Vector math over ArrayType(FloatType) columns — JVM-side
higher-order functions only (no Python UDFs): dot products, norms,
cosine similarity. Every fold is left-to-right, so the same
expression evaluated in another IEEE engine is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i in double, folded left-to-right."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit(a: Column, norm: Column | None = None) -> Column:
    """a / ||a|| — pre-normalize once so cosine becomes a plain dot;
    at scale this halves the arithmetic in any all-pairs stage.

    On hot paths MATERIALIZE the norm first and pass it in
    (``withColumn("nrm", l2_norm(e))`` then ``unit(e, F.col("nrm"))``):
    a lambda-captured outer expression re-evaluates per element, so
    the default recomputes the O(d) norm fold for each of the d
    components — O(d²) per vector (the ngram_lm_train lesson,
    text.py:_bigrams_col)."""
    n = l2_norm(a) if norm is None else norm
    return F.transform(a, lambda x: x.cast("double") / n)


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot`: same left-to-right fold, so the
    double result is bit-identical (list_reduce starts from the first
    element; Spark folds 0.0 + p1 + ... — identical in IEEE)."""
    return (f"list_reduce(list_transform(generate_series(1, len({a})), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            f"(x, y) -> x + y)")


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine`."""
    return (f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) "
            f"* sqrt({sql_dot(b, b)})))")
