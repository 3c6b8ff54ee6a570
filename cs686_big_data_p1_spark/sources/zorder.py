"""Z-order (Morton-curve) data layout: multi-dimensional file skipping.

Range-partitioning a fact table on ONE column gives perfect file-level
min/max pruning on that column and none on any other. At 100 TB,
queries filter lineitem on ship date AND part — a single sort order
can't serve both. Interleaving the bits of both columns' normalized
values (the Morton / Z-order curve — the technique behind Delta Lake's
OPTIMIZE ZORDER BY and ClickHouse's mortonEncode) clusters rows so
every file covers a small RECTANGLE of the (date, part) space: parquet
footer min/max stats then prune files for predicates on either column
or both.

Everything is JVM-side column arithmetic (shiftleft/or folds — one
whole-stage-codegen projection), a single range repartition on the
z-value, and a sortWithinPartitions; no UDFs, no skew (the z-value is
near-uniform when the inputs are), no driver work beyond the 1-row
min/max broadcast.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution; 2 dims -> 32-bit z-value


def _normalize(col: Column, cmin: Column, cmax: Column) -> Column:
    """Map col into [0, 2^Z_BITS - 1] by exact integer min/max scaling
    (bigint math; the degenerate max==min range maps to 0)."""
    span = cmax - cmin
    scaled = F.when(span == 0, F.lit(0)).otherwise(
        ((col - cmin) * F.lit((1 << Z_BITS) - 1)) / span
    )
    return F.floor(scaled).cast("long")


def _interleave(a: Column, b: Column) -> Column:
    """Morton-interleave two Z_BITS-bit ints: bit i of `a` lands at
    position 2i+1, bit i of `b` at 2i — one folded shift/or
    expression, fully inside whole-stage codegen."""
    pieces = []
    for i in range(Z_BITS):
        pieces.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        pieces.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), pieces)


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
) -> None:
    """Write df as parquet clustered on the Morton curve of
    (col_a, col_b). Both columns must be numeric (cast dates to
    epoch-days first). The z-value is computed per-row from the
    broadcast global min/max, rows are RANGE-partitioned on it (each
    output file = one contiguous z-range = one small rectangle of the
    key space), sorted within each file so row-group stats are tight
    too, and the helper column is dropped before the write."""
    stats = df.agg(
        F.min(col_a).cast("long").alias("a_min"),
        F.max(col_a).cast("long").alias("a_max"),
        F.min(col_b).cast("long").alias("b_min"),
        F.max(col_b).cast("long").alias("b_max"),
    )
    with_z = df.crossJoin(F.broadcast(stats)).withColumn(
        "_z",
        _interleave(
            _normalize(
                F.col(col_a).cast("long"), F.col("a_min"), F.col("a_max")
            ),
            _normalize(
                F.col(col_b).cast("long"), F.col("b_min"), F.col("b_max")
            ),
        ),
    ).drop("a_min", "a_max", "b_min", "b_max")
    (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of `column` from parquet footers — the
    metadata a scan's file-skipping consults. Driver-side METADATA
    read only (no data pages), the same footprint as any planner."""
    import pyarrow.parquet as papq

    out = []
    ds = papq.ParquetDataset(path)
    for frag in ds.fragments:
        pf = papq.ParquetFile(frag.path)
        lo, hi = None, None
        for rg in range(pf.metadata.num_row_groups):
            col = pf.metadata.row_group(rg).column(
                pf.schema_arrow.get_field_index(column)
            )
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((lo, hi))
    return out
