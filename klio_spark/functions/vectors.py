"""Vector ops over ArrayType embedding columns — pure Spark expressions.

No UDFs: F.zip_with/F.aggregate compile to Catalyst HigherOrderFunctions
evaluated JVM-side inside codegen, so a cosine over a 64-dim float column
costs no Python round-trip. All math in DOUBLE for cross-engine
reproducibility (matches DuckDB's list_cosine_similarity on DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ — sequential fold, same summation order as a scalar loop."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    """dot/(|a||b|); 0.0 when either norm is 0 (never NaN/null)."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def normalized(a: Column) -> Column:
    """a/|a| (zero vector stays zero). Pre-normalize BEFORE pair joins so
    per-pair cosine is a single dot fold — in an all-pairs join this cuts
    the inner-loop flops 3× and turns norm computation from O(pairs) into
    O(rows)."""
    n = l2_norm(a)
    return F.when(
        n > 0, F.transform(a, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(a, lambda x: F.lit(0.0)))
