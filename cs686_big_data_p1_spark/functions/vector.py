"""Deterministic vector math over array<float> embedding columns.

All reductions quantize each term to a fixed-point bigint
(floor(term * 1e12)) and sum integers, so results are order-independent
and bit-identical between Spark's distributed fold and DuckDB's serial
fold: float32 widens exactly to double, a product of two float32s is
exact in double (48-bit mantissa < 53), floor is exact, and bigint
addition is associative. No double->decimal rounding-rule dependence,
and integer sums are cheaper than decimal arithmetic at scale.

The same 1e12 quantization appears verbatim in every oracle SQL string
that checks these operators (operators/llm.py, operators/ann.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1e12


def norm_sq_q(col: Column) -> Column:
    """Quantized squared L2 norm: sum_i floor(x_i^2 * 1e12) as bigint.

    In-row array fold (F.aggregate) — no explode, no shuffle.
    Divide by 1e12 (after cast to double) for the real value.
    """
    return F.aggregate(
        col,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * x.cast("double") * F.lit(SCALE)).cast(
            "bigint"
        ),
    )


def norm(col: Column) -> Column:
    """L2 norm as double, derived from the quantized squared norm."""
    return F.sqrt(norm_sq_q(col).cast("double") / F.lit(SCALE))


def dot_q(a: Column, b: Column) -> Column:
    """Quantized dot product: sum_i floor(a_i * b_i * 1e12) as bigint."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(SCALE)
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product as double, from the quantized fold."""
    return dot_q(a, b).cast("double") / F.lit(SCALE)
