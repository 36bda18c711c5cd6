"""Vector math over array<float> embedding columns using Spark higher-order
functions (SURVEY.md §2 Part B "LLM-data extensions": cosine via
``F.aggregate(F.zip_with(...))``).

These run entirely JVM-side — no Python serialization per row — which is the
difference between O(cluster) and O(driver) at 100 TB. Accumulation is in
double even though components are float32, matching how DuckDB's
list_cosine_similarity and numpy behave closely enough for 4-decimal
agreement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays, accumulated as double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
