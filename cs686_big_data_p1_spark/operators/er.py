"""Entity resolution: multi-pass blocking + edit-distance matching.

Record linkage for catalog-style data (the relational cousin of the
document near-dup family in operators/llm.py): find name pairs that
refer to the same real-world entity despite typos/variants. The
classic scalable recipe — dedup to distinct names, generate candidate
pairs from MULTIPLE cheap blocking keys (a single key misses pairs
that differ in that key's token), union the passes, then score only
candidates with an exact edit distance.

Scale notes (100 TB):

  * The distinct() collapses the name column before any pairing —
    candidate volume scales with distinct-name cardinality, not row
    count (64 distinct names across 2,000 fixture parts; the same
    ratio holds for real catalogs).
  * Each blocking pass is an equi-join on its key — never a cross
    join. Blocks are capped at MAX_BLOCK_NAMES members (deterministic
    by name order, cap mirrored into the oracle), so one degenerate
    key (every product named "widget ...") cannot go quadratic — the
    MAX_BUCKET_DOCS pattern from operators/llm.py's LSH dedup.
  * levenshtein() is a JVM codegen built-in evaluated only on
    candidate pairs; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table

# Edit-distance threshold: <= 3 keeps one-token typos/variants
# ("cold widget" ~ "old widget") and rejects unrelated names.
MAX_EDIT_DIST = 3

# Per-block membership cap (see module docstring).
MAX_BLOCK_NAMES = 100


FUZZY_ORACLE = f"""
WITH names AS (SELECT DISTINCT p_name FROM part),
keyed AS (
  SELECT p_name, string_split(p_name, ' ')[1] AS k1,
         string_split(p_name, ' ')[-1] AS k2
  FROM names
),
b1 AS (
  SELECT p_name, k1 AS bkey FROM keyed
  QUALIFY row_number() OVER (PARTITION BY k1 ORDER BY p_name)
          <= {MAX_BLOCK_NAMES}
),
b2 AS (
  SELECT p_name, k2 AS bkey FROM keyed
  QUALIFY row_number() OVER (PARTITION BY k2 ORDER BY p_name)
          <= {MAX_BLOCK_NAMES}
),
cand AS (
  SELECT DISTINCT a_name, b_name FROM (
    SELECT a.p_name AS a_name, b.p_name AS b_name
    FROM b1 a JOIN b1 b ON a.bkey = b.bkey AND a.p_name < b.p_name
    UNION ALL
    SELECT a.p_name AS a_name, b.p_name AS b_name
    FROM b2 a JOIN b2 b ON a.bkey = b.bkey AND a.p_name < b.p_name
  )
)
SELECT a_name, b_name,
       CAST(levenshtein(a_name, b_name) AS INTEGER) AS edit_dist
FROM cand
WHERE levenshtein(a_name, b_name) <= {MAX_EDIT_DIST}
"""


@query("fuzzy_name_match", oracle=FUZZY_ORACLE)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part names by edit distance, with two blocking
    passes (first token, last token) so pairs differing in either
    token are still candidates.

    Scale: see module docstring — distinct-first, equi-join blocking,
    per-block cap, built-in levenshtein on candidates only.
    """
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    return match_names(names)


def match_names(names: DataFrame) -> DataFrame:
    """Core of fuzzy_name_match over any distinct (p_name) frame (the
    query wrapper binds the part table; tests feed degenerate-key
    corpora to pin the block cap's deterministic truncation)."""
    toks = F.split(F.col("p_name"), " ")
    keyed = names.select(
        "p_name",
        toks.getItem(0).alias("k1"),
        F.element_at(toks, -1).alias("k2"),
    )

    def block(key: str) -> DataFrame:
        w = Window.partitionBy(key).orderBy("p_name")
        return (
            keyed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= MAX_BLOCK_NAMES)
            .select(F.col("p_name"), F.col(key).alias("bkey"))
        )

    def pairs(b: DataFrame) -> DataFrame:
        a = b.select(F.col("p_name").alias("a_name"), "bkey")
        bb = b.select(F.col("p_name").alias("b_name"), "bkey")
        return a.join(
            bb, (a.bkey == bb.bkey) & (F.col("a_name") < F.col("b_name"))
        ).select("a_name", "b_name")

    cand = pairs(block("k1")).unionAll(pairs(block("k2"))).distinct()
    dist = F.levenshtein(F.col("a_name"), F.col("b_name"))
    return (
        cand.withColumn("edit_dist", dist.cast("int"))
        .where(F.col("edit_dist") <= MAX_EDIT_DIST)
    )
