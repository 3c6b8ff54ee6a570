"""Data-layout optimization for scan pruning: Z-order (Morton)
clustering and its measured zone-map payoff.

At 100 TB the cheapest query is the one that never reads the file:
engines skip a parquet file when its min/max zone for a filtered
column excludes the predicate. A single-column sort gives perfect
zones on that column and useless zones on every other; Z-ORDERING
interleaves the bits of two (or more) quantized columns so that files
are contiguous in a space-filling curve and EVERY interleaved column
gets zones a few times wider than optimal — the layout Delta Lake's
OPTIMIZE ZORDER BY and ClickHouse/Databricks liquid clustering
implement. zorder_layout builds both layouts relationally, derives
each file's zone map, and reports files-touched for one slab
predicate per dimension — the pruning ratio IS the query result, so
the benefit is oracle-checked, not asserted.

Everything is integer arithmetic (quantization = one multiply + one
floor division on exact bounds; Morton = bit shifts and masks), so
the whole layout decision is bit-identical in DuckDB.

Sibling: sources/zorder.py is the WRITE path (zorder_write actually
lays parquet files out on the Morton key and file_ranges reads the
real footer stats back; pytest-pinned). This module is the QUERY
path: the same curve expressed relationally so the pruning ratio
itself is oracle-checked — the two share the interleave definition
but not code, because this one must emit textually identical integer
expressions in both SQL dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, track_cache
from ..tables import load_table

Z_BITS = 8  # quantization bits per dimension
Z_CELLS_PER_FILE = 64  # morton cells per file -> 2^(2*8)/64 = 1024 files
Z_FILES_NAT = 1024  # natural (orderkey-range) layout file count
Z_SLAB_LO_PCT = 45  # predicate slab: the middle 10% of each key range
Z_SLAB_HI_PCT = 55


def _morton_terms(qx: str, qy: str, dialect: str) -> str:
    """Bit-interleave expression text, generated identically for both
    dialects so the plans compute the same integer: morton =
    sum over i of ((qx>>i)&1) * 2^(2i+1) + ((qy>>i)&1) * 2^(2i)
    (the bit positions are disjoint, so + == |)."""
    terms = []
    for i in range(Z_BITS):
        px, py = 1 << (2 * i + 1), 1 << (2 * i)
        if dialect == "spark":
            terms.append(f"(shiftright({qx}, {i}) & 1) * {px}")
            terms.append(f"(shiftright({qy}, {i}) & 1) * {py}")
        else:
            terms.append(f"((({qx}) >> {i}) & 1) * {px}")
            terms.append(f"((({qy}) >> {i}) & 1) * {py}")
    return " + ".join(terms)


_Q = 1 << Z_BITS

ZORDER_ORACLE = f"""
WITH b AS (
  SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
         min(l_suppkey) AS mins, max(l_suppkey) AS maxs,
         min(l_orderkey) AS minok, max(l_orderkey) AS maxok
  FROM lineitem
),
q AS (
  SELECT ((l_partkey - minp) * {_Q} // (maxp - minp + 1)) AS qx,
         ((l_suppkey - mins) * {_Q} // (maxs - mins + 1)) AS qy,
         ((l_orderkey - minok) * {Z_FILES_NAT} // (maxok - minok + 1))
             AS file_nat,
         l_partkey, l_suppkey
  FROM lineitem, b
),
m AS (
  SELECT ({_morton_terms('qx', 'qy', 'duck')}) // {Z_CELLS_PER_FILE}
             AS file_z,
         file_nat, l_partkey, l_suppkey
  FROM q
),
files AS (
  SELECT 'zorder' AS layout, file_z AS file_id,
         min(l_partkey) AS minpk, max(l_partkey) AS maxpk,
         min(l_suppkey) AS minsk, max(l_suppkey) AS maxsk,
         count(*) AS rows_in_file
  FROM m GROUP BY file_z
  UNION ALL
  SELECT 'natural', file_nat,
         min(l_partkey), max(l_partkey),
         min(l_suppkey), max(l_suppkey), count(*)
  FROM m GROUP BY file_nat
),
preds AS (
  SELECT 'partkey_slab' AS predicate, 'pk' AS dim,
         minp + ((maxp - minp) * {Z_SLAB_LO_PCT}) // 100 AS lo,
         minp + ((maxp - minp) * {Z_SLAB_HI_PCT}) // 100 AS hi
  FROM b
  UNION ALL
  SELECT 'suppkey_slab', 'sk',
         mins + ((maxs - mins) * {Z_SLAB_LO_PCT}) // 100,
         mins + ((maxs - mins) * {Z_SLAB_HI_PCT}) // 100
  FROM b
),
matched AS (
  SELECT p.predicate, count(*) AS rows_matched
  FROM m, preds p
  WHERE (p.dim = 'pk' AND m.l_partkey BETWEEN p.lo AND p.hi)
     OR (p.dim = 'sk' AND m.l_suppkey BETWEEN p.lo AND p.hi)
  GROUP BY p.predicate
)
SELECT f.layout, p.predicate,
       count(*) AS files_total,
       CAST(sum(CASE WHEN (p.dim = 'pk' AND f.maxpk >= p.lo
                                        AND f.minpk <= p.hi)
                       OR (p.dim = 'sk' AND f.maxsk >= p.lo
                                        AND f.minsk <= p.hi)
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
       CAST(sum(CASE WHEN (p.dim = 'pk' AND f.maxpk >= p.lo
                                        AND f.minpk <= p.hi)
                       OR (p.dim = 'sk' AND f.maxsk >= p.lo
                                        AND f.minsk <= p.hi)
                     THEN f.rows_in_file ELSE 0 END) AS BIGINT)
           AS rows_in_touched,
       mt.rows_matched
FROM files f
CROSS JOIN preds p
JOIN matched mt ON mt.predicate = p.predicate
GROUP BY f.layout, p.predicate, mt.rows_matched
"""


@query("zorder_layout", oracle=ZORDER_ORACLE)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering of lineitem on (l_partkey, l_suppkey), with
    the pruning payoff measured against the natural (orderkey-range)
    layout. Each row's two keys are quantized to {Z_BITS} bits over
    the exact key bounds, bit-interleaved into a 16-bit Morton code,
    and files = contiguous runs of {Z_CELLS_PER_FILE} Morton cells
    (prefix binning — no global sort needed: at scale this is
    repartitionByRange on the Morton key, each range = one file). The
    output compares, per layout x slab predicate, how many files a
    zone-map (per-file min/max) scan planner would read. The natural
    layout prunes partkey slabs not at all; Z-order prunes BOTH
    dimensions to roughly sqrt(files) — the measured, oracle-checked
    argument for interleaved layouts at 100 TB.

    Scale: two groupBys over bounded file counts ({Z_FILES_NAT} zones
    per layout), one 1-row bounds aggregate broadcast everywhere, and
    one exact-match count per predicate; nothing wider than the scan
    itself. rows_matched is layout-invariant by construction (same
    rows, different placement) — its repetition across layouts in the
    output is the built-in sanity check.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    b = li.agg(
        F.min("l_partkey").alias("minp"),
        F.max("l_partkey").alias("maxp"),
        F.min("l_suppkey").alias("mins"),
        F.max("l_suppkey").alias("maxs"),
        F.min("l_orderkey").alias("minok"),
        F.max("l_orderkey").alias("maxok"),
    )
    q = li.crossJoin(F.broadcast(b)).select(
        F.expr(f"((l_partkey - minp) * {_Q}) div (maxp - minp + 1)").alias("qx"),
        F.expr(f"((l_suppkey - mins) * {_Q}) div (maxs - mins + 1)").alias("qy"),
        F.expr(
            f"((l_orderkey - minok) * {Z_FILES_NAT}) div (maxok - minok + 1)"
        ).alias("file_nat"),
        "l_partkey",
        "l_suppkey",
    )
    m = q.select(
        F.expr(
            f"({_morton_terms('qx', 'qy', 'spark')}) div {Z_CELLS_PER_FILE}"
        ).alias("file_z"),
        "file_nat",
        "l_partkey",
        "l_suppkey",
    )
    # reused by both zone rollups + the matched counts — cache once,
    # driver unpersists after materialization (registry.clear_caches)
    m = track_cache(m)

    def zones(file_col: str, layout: str) -> DataFrame:
        return m.groupBy(F.col(file_col).alias("file_id")).agg(
            F.min("l_partkey").alias("minpk"),
            F.max("l_partkey").alias("maxpk"),
            F.min("l_suppkey").alias("minsk"),
            F.max("l_suppkey").alias("maxsk"),
            F.count(F.lit(1)).alias("rows_in_file"),
        ).select(F.lit(layout).alias("layout"), "*")

    files = zones("file_z", "zorder").unionByName(zones("file_nat", "natural"))
    preds = b.select(
        F.lit("partkey_slab").alias("predicate"),
        F.lit("pk").alias("dim"),
        F.expr(f"minp + ((maxp - minp) * {Z_SLAB_LO_PCT}) div 100").alias("lo"),
        F.expr(f"minp + ((maxp - minp) * {Z_SLAB_HI_PCT}) div 100").alias("hi"),
    ).unionByName(
        b.select(
            F.lit("suppkey_slab").alias("predicate"),
            F.lit("sk").alias("dim"),
            F.expr(f"mins + ((maxs - mins) * {Z_SLAB_LO_PCT}) div 100").alias(
                "lo"
            ),
            F.expr(f"mins + ((maxs - mins) * {Z_SLAB_HI_PCT}) div 100").alias(
                "hi"
            ),
        )
    )
    hit = (
        (F.col("dim") == "pk")
        & (F.col("l_partkey") >= F.col("lo"))
        & (F.col("l_partkey") <= F.col("hi"))
    ) | (
        (F.col("dim") == "sk")
        & (F.col("l_suppkey") >= F.col("lo"))
        & (F.col("l_suppkey") <= F.col("hi"))
    )
    matched = (
        m.crossJoin(F.broadcast(preds))
        .where(hit)
        .groupBy("predicate")
        .agg(F.count(F.lit(1)).alias("rows_matched"))
    )
    touch = (
        (F.col("dim") == "pk")
        & (F.col("maxpk") >= F.col("lo"))
        & (F.col("minpk") <= F.col("hi"))
    ) | (
        (F.col("dim") == "sk")
        & (F.col("maxsk") >= F.col("lo"))
        & (F.col("minsk") <= F.col("hi"))
    )
    return (
        files.crossJoin(F.broadcast(preds))
        .groupBy("layout", "predicate")
        .agg(
            F.count(F.lit(1)).alias("files_total"),
            F.sum(F.when(touch, 1).otherwise(0)).alias("files_touched"),
            F.sum(F.when(touch, F.col("rows_in_file")).otherwise(0)).alias(
                "rows_in_touched"
            ),
        )
        .join(F.broadcast(matched), "predicate")
        .select(
            "layout",
            "predicate",
            "files_total",
            "files_touched",
            "rows_in_touched",
            "rows_matched",
        )
    )
