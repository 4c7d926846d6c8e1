"""Vector functions over embedding columns (array<float>/array<double>).

Pure Column expressions — `zip_with` + `aggregate` keep the dot product
inside codegen; no Python crosses the wire. Used by similarity search
and embedding-cosine near-dup (SURVEY.md §2.9).

Float determinism note: folds are sequential left-to-right in both Spark
(`aggregate`) and the DuckDB oracles (`list_dot_product`), and inputs
are cast to double before arithmetic, so results are bit-identical
cross-engine for the same vectors.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "norm",
    "l2_normalize",
    "cosine_similarity",
    "l2_distance",
    "max_abs",
    "quantize_int8",
]

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _d(c: ColumnOrName) -> Column:
    return _col(c).cast("array<double>")


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product via zip_with + aggregate (sequential fold)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: ColumnOrName) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def l2_normalize(a: ColumnOrName) -> Column:
    """Unit-norm copy of the vector; all-zero vectors stay all-zero
    (try_divide null → coalesce back to 0.0 per component)."""
    inv = F.try_divide(F.lit(1.0), norm(a))
    return F.transform(_d(a), lambda x: F.coalesce(x * inv, F.lit(0.0)))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def l2_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean distance."""
    diff = F.zip_with(_d(a), _d(b), lambda x, y: x - y)
    return F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def max_abs(a: ColumnOrName) -> Column:
    """Largest |component| (the symmetric-quantization range)."""
    return F.array_max(F.transform(_d(a), lambda x: F.abs(x)))


def quantize_int8(a: ColumnOrName, scale: Column) -> Column:
    """Symmetric int8 scalar quantization against a precomputed scale
    (`max_abs(v)/127`): q_i = round(v_i / scale), so every component
    lands in [-127, 127] by construction. Zero vectors (scale 0) map to
    all-zero codes via try_divide's NULL → coalesce 0.

    4× smaller than float32 on the wire and in cache — at 100 TB of
    embeddings this is the difference between a shuffle that fits and
    one that spills; recall loss for cosine top-k is typically <1% at
    int8. Pass `scale` as a COLUMN REFERENCE (projected beforehand),
    not the expression, or it re-evaluates per component."""
    return F.transform(
        _d(a),
        lambda x: F.coalesce(
            F.round(F.try_divide(x, scale), 0), F.lit(0.0)
        ).cast("int"),
    )
