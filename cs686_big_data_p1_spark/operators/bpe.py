"""BPE merge learning — tokenizer training as iterative DataFrame
aggregation over the word-frequency table.

The task brief's "BPE-ish" token counting (operators/llm.py
token_count) consumes a tokenizer; this operator LEARNS one: the
byte-pair-encoding merge table (Sennrich et al. 2016), the training
step behind every modern subword vocabulary. The reference engine has
no text layer at all; within this repo it is the iterative sibling of
collocations_lift (operators/search.py) the same way pagerank_copurchase
iterates dedup_clusters' join-per-round shape.

Why this scales to 100 TB: BPE training never iterates over the
corpus. The corpus collapses ONCE into (word, freq) — a vocabulary-
sized table (Heaps' law: ~1e6 rows for web-scale text) — and every
merge round runs on that table only: pair counts are a groupBy over
the exploded symbol pairs, the winning pair is a TakeOrdered(1)
broadcast back, and the merge rewrite is a map-side string replace.
This is exactly how production trainers (HF tokenizers) structure it.

Determinism contract: pair counts are exact bigints; the argmax pair
breaks ties by (count DESC, left ASC, right ASC); the merge rewrite
is leftmost-nonoverlapping `replace` — verified bit-identical between
Java's String replace and DuckDB's replace (pinned by a pytest on the
pathological overlapping-run input). Symbol sequences ride a 0x1F
unit-separator sentinel so a merged symbol can never false-match
across symbol boundaries ("ca","b" must not match the pair ("a","b")).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

N_MERGES = 8
SEP = "\x1f"  # unit separator: cannot occur in the space-split tokens
_SEP_SQL = "chr(31)"


def _bpe_chain() -> str:
    """The shared WITH-clause body: w0/s0 plus N_MERGES unrolled
    (count -> argmax -> rewrite) rounds; the final state is s{N_MERGES}
    (fully-merged per-word sequences) and b1..bN (the chosen pairs)."""
    steps = []
    prev = "s0"
    for k in range(1, N_MERGES + 1):
        steps.append(
            f"""p{k} AS (
  SELECT p.x AS x, p.y AS y, sum(freq) AS c
  FROM (
    SELECT freq,
           unnest([{{'x': toks[i], 'y': toks[i+1]}}
                   for i in range(1, len(toks))]) AS p
    FROM (
      SELECT freq,
             list_filter(string_split(seq, {_SEP_SQL}),
                         t -> len(t) > 0) AS toks
      FROM {prev}
    )
  )
  GROUP BY p.x, p.y
),
b{k} AS (SELECT x, y, c FROM p{k} ORDER BY c DESC, x, y LIMIT 1),
s{k} AS (
  SELECT word, freq,
         replace(seq,
                 {_SEP_SQL} || b.x || {_SEP_SQL} || b.y || {_SEP_SQL},
                 {_SEP_SQL} || b.x || b.y || {_SEP_SQL}) AS seq
  FROM {prev} CROSS JOIN b{k} b
)"""
        )
        prev = f"s{k}"
    chain = ",\n".join(steps)
    return f"""w0 AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents
        WHERE length(text) > 0)
  WHERE length(word) > 0
  GROUP BY word
),
s0 AS (
  SELECT word, freq,
         {_SEP_SQL} || array_to_string(
             [word[i] for i in range(1, len(word)+1)], {_SEP_SQL})
           || {_SEP_SQL} AS seq
  FROM w0
),
{chain}"""


def _bpe_oracle() -> str:
    merges = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, x AS left_sym, y AS right_sym,"
        f" c AS pair_count FROM b{k}"
        for k in range(1, N_MERGES + 1)
    )
    return f"""
WITH {_bpe_chain()}
SELECT CAST(merge_rank AS INTEGER) AS merge_rank, left_sym, right_sym,
       CAST(pair_count AS BIGINT) AS pair_count
FROM ({merges})
"""


BPE_ORACLE = _bpe_oracle()

BPE_ENCODE_ORACLE = f"""
WITH {_bpe_chain()},
tc AS (
  SELECT word,
         len(list_filter(string_split(seq, {_SEP_SQL}),
                         t -> len(t) > 0)) AS n_tok
  FROM s{N_MERGES}
),
words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
FROM words JOIN tc USING (word)
WHERE length(word) > 0
GROUP BY doc_id
"""


@query("bpe_merges", oracle=BPE_ORACLE)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {N_MERGES} BPE merges from the corpus: per
    round, count adjacent symbol pairs weighted by word frequency,
    pick the most frequent pair (count DESC, pair ASC tie-break),
    and rewrite every word's symbol sequence with the merged symbol
    (leftmost-nonoverlapping, the standard greedy application).

    Scale shape per round: ONE vocabulary-sized groupBy (pair counts),
    one TakeOrdered(1) — per-partition heaps, never a global sort —
    and one map-side rewrite with the winning pair broadcast as a
    1-row crossJoin. Sequences localCheckpoint per round so round k's
    plan is depth-1 instead of a k-deep replace chain (the
    dedup_clusters / pagerank iteration idiom). The corpus is touched
    exactly once, in the initial (word, freq) reduction."""
    merges, _ = _train(spark, sf_dir)
    return merges


def _train(spark: SparkSession, sf_dir: str):
    """Run the merge-learning loop; return (merge table, final
    fully-merged per-word sequences). The final sequences ARE the
    greedy rank-order encoding of every corpus word — bpe_encode
    reuses them instead of re-applying the merge table."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    w0 = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = w0.select(
        "word",
        "freq",
        F.concat(
            F.lit(SEP), F.array_join(F.split("word", ""), SEP), F.lit(SEP)
        ).alias("seq"),
    ).localCheckpoint(eager=True)

    merge_rows = []
    for k in range(1, N_MERGES + 1):
        toks = F.filter(F.split("seq", SEP), lambda t: F.length(t) > 0)
        pairs = (
            seqs.withColumn("toks", toks)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "zip_with(slice(toks, 1, size(toks) - 1),"
                        " slice(toks, 2, size(toks) - 1),"
                        " (a, b) -> struct(a AS x, b AS y))"
                    )
                ).alias("p"),
            )
        )
        counts = pairs.groupBy(
            F.col("p.x").alias("x"), F.col("p.y").alias("y")
        ).agg(F.sum("freq").alias("c"))
        best = counts.orderBy(
            F.col("c").desc(), F.col("x"), F.col("y")
        ).limit(1)
        best = best.localCheckpoint(eager=True)
        merge_rows.append(
            best.select(
                F.lit(k).cast("int").alias("merge_rank"),
                F.col("x").alias("left_sym"),
                F.col("y").alias("right_sym"),
                F.col("c").alias("pair_count"),
            )
        )
        seqs = (
            seqs.crossJoin(F.broadcast(best))
            .select(
                "word",
                "freq",
                F.expr(
                    f"replace(seq, concat('{SEP}', x, '{SEP}', y, '{SEP}'),"
                    f" concat('{SEP}', x, y, '{SEP}'))"
                ).alias("seq"),
            )
            .localCheckpoint(eager=True)
        )

    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out, seqs


@query("bpe_encode", oracle=BPE_ENCODE_ORACLE)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned tokenizer: per-document token count under the
    {N_MERGES}-merge BPE vocabulary bpe_merges trains — the train ->
    apply loop every tokenizer pipeline closes (and the exact-BPE
    upgrade of token_count's regex approximation).

    Encoding a known word is a VOCABULARY lookup, not a re-derivation:
    training's final per-word sequences already carry every merge
    applied in rank order (greedy leftmost-nonoverlapping — the same
    deterministic rewrite an encoder performs), so the engine joins
    the exploded corpus words against that vocabulary-sized table and
    sums token counts per doc. Oracle: the same unrolled-CTE chain as
    bpe_merges, aggregated over s{N_MERGES} instead of the argmax rows.

    Scale: the vocabulary table is Heaps-law-sized, the join key is
    the word (high-cardinality, uniform), and the per-doc rollup
    map-side combines. Nothing about encoding touches the corpus a
    second time beyond the one explode."""
    _, seqs = _train(spark, sf_dir)
    toks = F.filter(F.split("seq", SEP), lambda t: F.length(t) > 0)
    tc = seqs.select("word", F.size(toks).alias("n_tok"))
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
    )
    return (
        words.join(tc, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_tok").cast("long").alias("n_bpe_tokens"))
    )
