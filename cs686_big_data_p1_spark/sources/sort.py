"""General total-order sort (the layout family's missing primitive —
VERDICT r6/r7 gap; zorder/compaction/bucketing build layouts, this one
builds the globally-sorted layout range joins, merge readers, and
sorted-run compaction consume).

Two paths, both ending in repartitionByRange + sortWithinPartitions —
the plan Spark's own orderBy lowers to, kept EXPLICIT so the caller
controls partition count and boundary provenance instead of getting
whatever the final stage inherited:

  * `total_order_sort` — Catalyst-native. RangePartitioning samples
    reservoir-style per input partition with a FIXED per-partition
    seed (byteswapped partition index), so boundaries are
    deterministic for a fixed input layout; AQE may still coalesce.
    This is the default: zero extra passes over the data.
  * `range_boundaries` + `total_order_sort_pinned` — boundary values
    computed from an explicitly SEEDED sample and returned to the
    caller (bounded driver collect: sample_per_partition x
    num_partitions rows, the PQ-train-cap discipline). What pinning
    makes reproducible is the KEY -> partition-id mapping: a given key
    lands in the same id across reruns and across different upstream
    partitionings — so yesterday's compaction boundaries still mean
    something today. The final id -> file PACKING still goes through
    one range exchange whose own sampling may merge adjacent ids into
    one file (global order is unaffected; a consumer needing strict
    one-file-per-id alignment should write `partitionBy("_pid")`-style
    directories instead). Row placement is a broadcast comparison
    against the <= num_partitions-1 boundary rows — O(#boundaries)
    JVM comparisons per row, no shuffle beyond the final range
    exchange, no UDFs.

Global-order contract (pytest-pinned): concatenating the output files
in partition order yields the fully sorted dataset — every file's max
key <= the next file's min key, rows sorted within each file.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SORT_SAMPLE_PER_PARTITION = 200  # boundary-sample rows per target part


def _lex_less(cols: list[str], bound: tuple) -> Column:
    """Lexicographic `bound < row-key` over the column tuple, NULL-SAFE
    for data NULLs (boundaries themselves are never NULL — see
    range_boundaries): a NULL key component sorts BELOW every boundary
    value (Spark's asc NULLS FIRST), which falls out of coalescing the
    null comparison to false — `bound < NULL` is not-less, so the row
    lands in the earliest partition its non-null prefix allows."""
    # bound < key  <=>  OR_i ( AND_{j<i} b_j = k_j ) AND b_i < k_i
    terms = []
    for i, c in enumerate(cols):
        eqs = [F.lit(bound[j]).eqNullSafe(F.col(cols[j])) for j in range(i)]
        lt = F.coalesce(F.lit(bound[i]) < F.col(c), F.lit(False))
        terms.append(reduce(lambda a, b: a & b, eqs, F.lit(True)) & lt)
    return reduce(lambda a, b: a | b, terms)


def range_boundaries(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    seed: int = 0,
    sample_per_partition: int = SORT_SAMPLE_PER_PARTITION,
) -> list[tuple]:
    """num_partitions-1 split keys at even quantiles of a seeded
    sample, as plain python tuples (deterministic for a fixed dataset
    + seed: the sample is seeded and tie-broken by the full key
    before quantile selection). Bounded driver collect:
    <= sample_per_partition x num_partitions rows."""
    n_sample = sample_per_partition * num_partitions
    # NULL keys are excluded from boundary candidates (a NULL boundary
    # has no defined lexicographic position); NULL-keyed DATA rows
    # still sort correctly — _lex_less treats them as below every
    # boundary, so they land in partition 0, Spark's asc NULLS FIRST.
    keyed = df.select(*cols).na.drop(subset=list(cols))
    total = keyed.count()
    if total == 0 or num_partitions <= 1:
        return []
    frac = min(1.0, float(n_sample) / total)
    sample = [
        tuple(r)
        for r in keyed.sample(fraction=frac, seed=seed)
        .limit(n_sample)
        .collect()
    ]
    sample.sort()
    if not sample:
        return []
    bounds = []
    for i in range(1, num_partitions):
        q = min(len(sample) - 1, (i * len(sample)) // num_partitions)
        bounds.append(sample[q])
    # dedupe (heavily tied keys can repeat a boundary; fewer, wider
    # partitions is the correct degradation)
    out: list[tuple] = []
    for b in bounds:
        if not out or b != out[-1]:
            out.append(b)
    return out


def total_order_sort(
    df: DataFrame, cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Globally sort by `cols` (asc) across num_partitions output
    partitions: partition i holds keys <= partition i+1's, rows sorted
    within — Catalyst's sampled RangePartitioning, made explicit."""
    parts = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    return parts.sortWithinPartitions(*cols)


def total_order_sort_pinned(
    df: DataFrame, cols: list[str], boundaries: list[tuple]
) -> DataFrame:
    """Globally sort by `cols` with CALLER-PINNED range boundaries
    (from range_boundaries, possibly computed on an earlier dataset
    generation): row -> partition id = #boundaries strictly below its
    key (map-side comparisons against literals), then ONE range
    exchange on the id + in-partition sort. The id is monotone in the
    key, so cross-file global order holds even if the final exchange
    merges adjacent ids."""
    if not boundaries:
        return df.coalesce(1).sortWithinPartitions(*cols)
    pid = reduce(
        lambda acc, b: acc + _lex_less(cols, b).cast("int"),
        boundaries,
        F.lit(0),
    )
    return (
        df.withColumn("_pid", pid)
        .repartitionByRange(len(boundaries) + 1, "_pid")
        .sortWithinPartitions("_pid", *cols)
        .drop("_pid")
    )


def write_sorted(
    df: DataFrame,
    cols: list[str],
    path: str,
    num_partitions: int | None = None,
    boundaries: list[tuple] | None = None,
) -> None:
    """Materialize the globally-sorted layout: one parquet file per
    range partition, file name order == key order (part-NNNNN names
    follow partition ids). Readers get merge-join-able sorted runs."""
    out = (
        total_order_sort_pinned(df, cols, boundaries)
        if boundaries is not None
        else total_order_sort(df, cols, num_partitions)
    )
    out.write.mode("overwrite").parquet(path)
