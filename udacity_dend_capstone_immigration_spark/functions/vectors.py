"""Vector expressions over ``array<float>`` embedding columns.

All JVM-side higher-order functions (``zip_with`` / ``aggregate``) — no
Python boundary, codegen-friendly, and they operate per-row so they scale
linearly with no shuffle. Elements are cast to double before arithmetic so
results are deterministic and match a double-precision SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two float arrays, in double."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm, in double."""
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double; null-safe only insofar as inputs are
    non-empty arrays (the embeddings table guarantees dim-64 vectors)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
