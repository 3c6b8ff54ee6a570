"""Z-order layout (sources/zorder.py): prove the multi-dimensional
file-skipping property from parquet footer stats — each z-ordered file
covers a small rectangle of the (ship-day, partkey) space, so min/max
pruning works on BOTH dimensions, where a single-column sort gives one
pruned dimension and one unprunable one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

N_FILES = 8


def _avg_width(ranges, span):
    widths = [hi - lo for lo, hi in ranges]
    return sum(widths) / len(widths) / span


def test_zorder_files_bound_both_dimensions(spark, tmp_path):
    from cs686_big_data_p1_spark.sources.zorder import (
        file_ranges,
        zorder_write,
    )
    from cs686_big_data_p1_spark.tables import load_table

    li = load_table(spark, SF_SMALL, "lineitem").withColumn(
        "ship_day", F.unix_date(F.to_date("l_shipdate"))
    )
    n_rows = li.count()
    pk_min, pk_max, d_min, d_max = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("ship_day"), F.max("ship_day"),
    ).collect()[0]
    pk_span, d_span = pk_max - pk_min, d_max - d_min

    # baseline: classic single-column (date) range sort
    date_path = str(tmp_path / "by_date")
    (
        li.repartitionByRange(N_FILES, "ship_day")
        .sortWithinPartitions("ship_day")
        .write.mode("overwrite")
        .parquet(date_path)
    )
    # candidate: z-order on (ship_day, l_partkey)
    z_path = str(tmp_path / "zorder")
    zorder_write(li, z_path, "ship_day", "l_partkey", n_files=N_FILES)

    # lossless
    assert spark.read.parquet(z_path).count() == n_rows

    zd = _avg_width(file_ranges(z_path, "ship_day"), d_span)
    zp = _avg_width(file_ranges(z_path, "l_partkey"), pk_span)
    bd = _avg_width(file_ranges(date_path, "ship_day"), d_span)
    bp = _avg_width(file_ranges(date_path, "l_partkey"), pk_span)

    # the date-sorted baseline prunes dates hard but cannot bound
    # partkey at all (every file spans ~the whole key range)
    assert bd < 0.25
    assert bp > 0.9
    # z-order bounds BOTH: with 8 files (3 z-prefix bits -> 4x2 grid)
    # the expected rectangle is ~1/4 of the date span x ~1/2 of the
    # partkey span; assert with slack
    assert zd < 0.6
    assert zp < 0.75
    # and the joint prunable volume (product of widths) is far smaller
    # than the baseline's
    assert zd * zp < 0.5 * bd * bp + 0.2  # absolute guard
    assert zp < bp  # partkey became prunable at all


def test_zorder_interleave_is_monotone_on_quadrants(spark):
    """Structural pin: the Morton value's top bits are the dimensions'
    top bits interleaved — points in the low-low quadrant always sort
    before points in the high-high quadrant."""
    from cs686_big_data_p1_spark.sources.zorder import Z_BITS, _interleave

    df = spark.createDataFrame(
        [(1, 1), (2, 2), ((1 << Z_BITS) - 1, (1 << Z_BITS) - 1)],
        "a long, b long",
    ).select(_interleave(F.col("a"), F.col("b")).alias("z"))
    z = [r.z for r in df.collect()]
    assert z[0] < z[1] < z[2]
    assert z[2] == (1 << (2 * Z_BITS)) - 1
