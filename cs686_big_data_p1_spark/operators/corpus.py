"""Corpus-preparation operators: chunking, substring-level dedup,
term weighting, diversity scoring, and domain mixing — the stages a
training-data pipeline runs between curation (operators/pipeline.py)
and dedup/similarity (operators/llm.py, operators/ann.py).

Cross-engine exactness rule (SURVEY.md §4.3, applied throughout this
module): every floating-point value the oracle hash-compares is
produced by a SINGLE IEEE-754 correctly-rounded operation (one
division or one subtraction) applied to exactly-computed integers.
No ln/log/exp/pow ever reaches an output column or an ORDER BY —
libm (DuckDB) and java.lang.Math (Spark) do not guarantee identical
last-ulp results for transcendentals, so a score like
``tf * ln(N/df)`` could rank ties differently per engine. tf-idf
here uses the raw-ratio idf ``N/df`` (documented on the operator);
diversity uses Gini–Simpson (``1 - Σc²/L²``) instead of Shannon
entropy for the same reason.

Scale notes (100 TB):

  * doc_chunk / span_dedup / text_normalize are map-side explodes or
    projections — zero pre-aggregation shuffle; span_dedup shuffles
    16-byte digests only, never block text.
  * tfidf_topterms shuffles (doc_id, term) pairs; a stopword's rows
    spread across docs so fan-out per row stays 1, and AQE skew-join
    splits the hot term partitions (same argument as decontaminate's
    boilerplate grams).
  * domain_mix groups by a LOW-cardinality key (source) — safe for a
    groupBy (map-side partial aggregation reduces each partition to
    ~n_sources rows before the exchange), unlike a low-cardinality
    WINDOW partition which funnels whole groups through single
    reducers (the sequence_pack lesson, operators/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query, track_cache
from ..tables import load_table

# RAG chunking: 64-word windows, stride 48 (16-word overlap keeps
# boundary sentences in two chunks — the retrieval-recall convention).
CHUNK_W = 64
CHUNK_STRIDE = 48

# span_dedup block width: 16 contiguous words. Non-overlapping blocks
# approximate suffix-array substring dedup (RefinedWeb/The Pile style)
# at 1/B the candidate volume of sliding shingles.
SPAN_B = 16

# tfidf_topterms: terms kept per document.
TFIDF_K = 5

# domain_mix: max upsampling factor for underrepresented sources.
MIX_CAP = 5.0


DOC_CHUNK_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents WHERE length(text) > 0
),
ks AS (
  SELECT doc_id, w, n,
         CAST(unnest(generate_series(
             0,
             CASE WHEN n <= {CHUNK_W} THEN 0
                  ELSE (n - {CHUNK_W} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
             END)) AS INTEGER) AS k
  FROM base
)
SELECT doc_id, k AS chunk_id,
       CAST(1 + k * {CHUNK_STRIDE} AS INTEGER) AS chunk_start,
       CAST(least({CHUNK_W}, n - k * {CHUNK_STRIDE}) AS INTEGER) AS n_words,
       array_to_string(
           w[1 + k * {CHUNK_STRIDE} : k * {CHUNK_STRIDE} + {CHUNK_W}],
           ' ') AS chunk_text
FROM ks
"""


@query("doc_chunk", oracle=DOC_CHUNK_ORACLE)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: split each document into overlapping
    {CHUNK_W}-word windows advancing {CHUNK_STRIDE} words per chunk,
    keeping provenance (doc_id, chunk_id, word offset).

    Pure map-side explode — no shuffle at any scale: the chunk count
    is derived per row with integer math (never a float ceil, so both
    engines agree at exact-multiple lengths), and slice() clamps the
    final ragged chunk. At 100 TB this is a single WholeStageCodegen
    pass over the documents scan with full column pruning."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    base = d.select(
        "doc_id",
        F.split("text", " ").alias("w"),
        F.size(F.split("text", " ")).alias("n"),
    )
    n_chunks_minus1 = F.when(F.col("n") <= CHUNK_W, F.lit(0)).otherwise(
        F.expr(f"(n - {CHUNK_W} + {CHUNK_STRIDE} - 1) DIV {CHUNK_STRIDE}")
    )
    ks = base.select(
        "doc_id",
        "w",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks_minus1.cast("int"))).alias("k"),
    )
    start = F.lit(1) + F.col("k") * CHUNK_STRIDE
    return ks.select(
        "doc_id",
        F.col("k").alias("chunk_id"),
        start.cast("int").alias("chunk_start"),
        F.least(F.lit(CHUNK_W), F.col("n") - F.col("k") * CHUNK_STRIDE)
        .cast("int")
        .alias("n_words"),
        F.array_join(F.slice(F.col("w"), start, CHUNK_W), " ").alias(
            "chunk_text"
        ),
    )


SPAN_HALF = SPAN_B // 2  # phase-1 offset: catches misaligned spans

SPAN_DEDUP_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents WHERE len(string_split(text, ' ')) >= {SPAN_B}
),
blocks AS (
  SELECT doc_id,
         md5(array_to_string(
             w[1 + p * {SPAN_HALF} + k * {SPAN_B}
               : p * {SPAN_HALF} + (k + 1) * {SPAN_B}], ' ')) AS block_hash
  FROM (SELECT doc_id, w,
               CAST(p AS INTEGER) AS p,
               CAST(unnest(generate_series(
                   0, (n - p * {SPAN_HALF}) // {SPAN_B} - 1)) AS INTEGER)
                   AS k
        FROM (SELECT doc_id, w, n, unnest([0, 1]) AS p FROM base)
        WHERE n - p * {SPAN_HALF} >= {SPAN_B})
)
SELECT block_hash,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences,
       min(doc_id) AS keeper_doc_id
FROM blocks
GROUP BY block_hash
HAVING count(DISTINCT doc_id) >= 2
"""


@query("span_dedup", oracle=SPAN_DEDUP_ORACLE)
def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup: hash {SPAN_B}-word blocks in TWO
    stride phases (word offsets 0 and {SPAN_HALF}) and report blocks
    appearing in two or more distinct documents — the block-hash
    approximation of suffix-array substring dedup (boilerplate
    headers/footers/licenses that document-level dedup_exact cannot
    see because the surrounding text differs).

    Phase 1's {SPAN_HALF}-word offset catches spans that sit at
    different word offsets in different documents (phase-0 block of
    one doc == phase-1 block of the other whenever the offsets differ
    by {SPAN_HALF} mod {SPAN_B}); equality is on content hash, so
    cross-phase matches need no alignment bookkeeping. Residual
    approximation: offsets differing by anything else mod {SPAN_HALF}
    still slip through (full coverage is the suffix-array/minimizer
    territory the docstring trades away for 2x candidate volume).

    Scale: the explode is map-side; only 32-char digests shuffle
    (never block text), and the groupBy key is the digest itself —
    uniformly distributed by construction, no skew. Tail words short
    of a full block are dropped in both engines per phase (docs
    shorter than {SPAN_B} words contribute nothing; Spark's
    sequence() would fabricate a descending range for them, so they
    are filtered explicitly — same contract as decontaminate)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("w")).where(
        F.size("w") >= SPAN_B
    )
    phased = base.select(
        "doc_id",
        "w",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("p"),
    ).where(F.size("w") - F.col("p") * SPAN_HALF >= SPAN_B)
    blocks = phased.select(
        "doc_id",
        "w",
        "p",
        F.explode(
            F.sequence(
                F.lit(0),
                ((F.size("w") - F.col("p") * SPAN_HALF) / SPAN_B).cast("int")
                - 1,
            )
        ).alias("k"),
    ).select(
        "doc_id",
        F.md5(
            F.array_join(
                F.slice(
                    F.col("w"),
                    F.lit(1) + F.col("p") * SPAN_HALF + F.col("k") * SPAN_B,
                    SPAN_B,
                ),
                " ",
            )
        ).alias("block_hash"),
    )
    return (
        blocks.groupBy("block_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
    )


TFIDF_ORACLE = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE length(text) > 0
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
n AS (
  SELECT count(*) AS n_docs FROM documents WHERE length(text) > 0
),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         t.tf * n.n_docs / d.df AS tfidf
  FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, rnk
FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rnk
  FROM scored
)
WHERE rnk <= {TFIDF_K}
"""


@query("tfidf_topterms", oracle=TFIDF_ORACLE)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_K} characteristic terms per document by tf-idf with
    the RAW-RATIO idf ``N/df`` (not ``ln(N/df)``): the score is then
    ``bigint * bigint / bigint`` — a single correctly-rounded IEEE
    division, bit-identical across engines, so the per-doc ranking
    (score DESC, term ASC) can never diverge on a last-ulp tie the
    way a libm-vs-Math.log ln() could. The log-damped and raw-ratio
    variants induce different cross-term orderings in general; this
    operator DEFINES its score as the raw ratio and the oracle mirrors
    it exactly.

    Scale: tf groups by (doc_id, term) — high-cardinality, uniform;
    df is a vocabulary-sized second aggregate; the tf⋈df join fans
    out 1:1 per row with AQE splitting hot stopword partitions; the
    top-K window partitions by doc_id (high-cardinality — the safe
    kind of window key). N arrives via a broadcast 1-row crossJoin,
    never a driver-side collect."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = track_cache(tf)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * F.col("n_docs") / F.col("df")).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= TFIDF_K)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
    )


LEXDIV_ORACLE = """
WITH counts AS (
  SELECT doc_id, term, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE length(text) > 0)
  GROUP BY doc_id, term
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       count(*) AS n_distinct,
       CAST(count(*) AS DOUBLE) / sum(c) AS ttr,
       1.0 - CAST(sum(c * c) AS DOUBLE) / (sum(c) * sum(c)) AS simpson
FROM counts
GROUP BY doc_id
"""


@query("lexical_diversity", oracle=LEXDIV_ORACLE)
def lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity: type-token ratio and the
    Gini–Simpson index ``1 - Σc²/L²`` — the repetition/diversity
    quality signal, chosen over Shannon entropy because it needs no
    log: every aggregate (Σc, Σc², type count) is exact bigint math
    in any summation order, and each output float is one
    correctly-rounded division — the distributed result is
    bit-identical to the serial oracle (module exactness rule).

    Scale: one (doc_id, term) groupBy then one doc_id groupBy, both
    high-cardinality keys with map-side partial aggregation."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    return agg.select(
        "doc_id",
        "n_words",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_words")).alias("ttr"),
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("n_words") * F.col("n_words"))
        ).alias("simpson"),
    )


DOMAIN_MIX_ORACLE = f"""
WITH per_src AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents WHERE length(text) > 0
  GROUP BY source
),
tot AS (
  SELECT sum(n_tokens) AS total_tokens, count(*) AS n_sources FROM per_src
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / total_tokens AS token_share,
       least({MIX_CAP},
             (1.0 / n_sources) / (CAST(n_tokens AS DOUBLE) / total_tokens))
           AS mix_weight
FROM per_src CROSS JOIN tot
"""


@query("domain_mix", oracle=DOMAIN_MIX_ORACLE)
def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights: per-source token share and the
    upsampling factor that would equalize source contributions,
    capped at {MIX_CAP}× (the DoReMi/Pile-style static mix table a
    sampler consumes downstream). All counts are exact bigints;
    token_share and mix_weight are single divisions replicated
    verbatim in the oracle — same expression tree, same rounding.

    Scale: groupBy on the LOW-cardinality source key is safe —
    map-side partial aggregation collapses each of the corpus's
    partitions to ~n_sources rows before the exchange (this is the
    groupBy/window asymmetry the module docstring records); the
    totals frame is one row, broadcast back over the ~n_sources
    result."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    per_src = track_cache(per_src)
    tot = per_src.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_tokens").cast("double") / F.col("total_tokens")
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        F.least(F.lit(MIX_CAP), (F.lit(1.0) / F.col("n_sources")) / share)
        .alias("mix_weight"),
    )


TEXT_NORMALIZE_ORACLE = """
SELECT doc_id,
       md5(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g'))) AS norm_hash,
       length(text) AS n_chars_raw,
       length(trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g'))) AS n_chars_norm,
       (trim(regexp_replace(
           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g')) <> text) AS changed
FROM documents
"""


@query("text_normalize", oracle=TEXT_NORMALIZE_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization: lowercase, strip non-alnum,
    collapse runs of spaces, trim — emitting the normalized
    fingerprint (md5) plus before/after lengths so downstream exact
    dedup on norm_hash catches case/punctuation-only duplicates that
    dedup_exact's raw hash misses.

    The regex vocabulary is deliberately restricted to literal
    classes ``[^a-z0-9 ]`` and `` +`` — the subset on which Java
    regex (Spark) and RE2 (DuckDB) agree; no \\s, \\p{...}, or
    lookarounds. Pure projection: zero shuffle at any scale (the
    synthetic fixture is already lowercase-alnum, so `changed` is
    false there — tests/test_corpus.py exercises the messy-input
    path with mixed case, punctuation, and double spaces)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
        (norm != F.col("text")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# Exact distributed heavy hitters (frequent terms)
# ---------------------------------------------------------------------------

HH_PHI_INV = 200  # report terms with freq >= total_tokens / 200 (phi = 0.5%)
HH_K = 1024  # Misra-Gries counters per partition; guarantee needs K+1 > HH_PHI_INV

def mg_update(counters: dict, texts, k: int) -> None:
    """Fold one batch of texts into a Misra-Gries summary of <= k
    counters, in place. Over-full tables shed mass by subtracting the
    (k+1)-th largest count from every counter and dropping the
    non-positive ones — each shed event removes >= t*(k+1) total mass,
    so the cumulative per-item decrement is bounded by N/(k+1) and any
    term with true partition count > N/(k+1) is guaranteed to survive
    (the retention bound heavy_hitters' exactness proof rests on)."""
    for text in texts:
        if text is None:
            continue
        for term in text.split(" "):
            c = counters.get(term)
            if c is not None:
                counters[term] = c + 1
            else:
                counters[term] = 1
                if len(counters) > k:
                    vals = sorted(counters.values(), reverse=True)
                    t = vals[k]
                    shed = {m: v - t for m, v in counters.items() if v > t}
                    counters.clear()
                    counters.update(shed)


HEAVY_HITTERS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
t AS (SELECT count(*) AS n FROM tok)
SELECT term, count(*) AS freq
FROM tok, t
GROUP BY term, n
HAVING count(*) * {HH_PHI_INV} >= n
"""


@query("heavy_hitters", oracle=HEAVY_HITTERS_ORACLE)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT phi-frequent terms (freq >= N/{HH_PHI_INV}) over the corpus
    token stream, via the classic two-pass distributed heavy-hitters
    scheme: (1) each partition builds a bounded Misra-Gries summary
    (HH_K counters, batched uniform-decrement) and emits only its
    candidate terms; (2) an exact recount restricted to the candidate
    union, filtered by the exact integer test freq * {HH_PHI_INV} >= N.
    The union of per-partition MG summaries is a SUPERSET of every
    global phi-heavy hitter whenever HH_K + 1 > {HH_PHI_INV} (pigeonhole:
    if c_p(x) <= N_p/(K+1) on every partition then c(x) <= N/(K+1)
    < phi*N), so pass 2's exact filter makes the final answer exact —
    the oracle is the plain GROUP BY/HAVING over all tokens.

    Scale: pass 1 is map-side only, O(K) memory per partition, and
    emits <= K rows per partition (candidate volume is O(K * #partitions)
    regardless of data size — never the vocabulary). Pass 2 explodes
    tokens once and shuffles on term for BOTH the candidate semi-join
    and the recount groupBy (same key, AQE reuses the exchange); the
    corpus total is the only broadcast (1 row). No driver-side state:
    candidates stay distributed.
    """
    docs = load_table(spark, sf_dir, "documents").select("text")

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            mg_update(counters, pdf["text"], HH_K)
        import pandas as pd

        yield pd.DataFrame({"term": list(counters.keys())})

    cand = (
        docs.mapInPandas(mg_partition, "term string")
        .distinct()
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    n = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(cand, "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(n))
        .where(F.col("freq") * HH_PHI_INV >= F.col("n"))
        .select("term", "freq")
    )


# ---------------------------------------------------------------------------
# Boilerplate removal (span_dedup's transform half)
# ---------------------------------------------------------------------------

REMOVE_BOILERPLATE_ORACLE = f"""
WITH dups AS (SELECT block_hash FROM ({SPAN_DEDUP_ORACLE})),
base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
),
parts AS (
  SELECT doc_id, k,
         array_to_string(w[1 + k * {SPAN_B} : (k + 1) * {SPAN_B}], ' ')
           AS blk,
         k < n // {SPAN_B} AS is_full
  FROM (SELECT doc_id, w, n,
               CAST(unnest(generate_series(0, n // {SPAN_B})) AS INTEGER)
                   AS k
        FROM base)
  WHERE k < n // {SPAN_B} OR n % {SPAN_B} > 0
),
kept AS (
  SELECT p.doc_id, p.k, p.blk
  FROM parts p
  WHERE NOT (p.is_full AND EXISTS
             (SELECT 1 FROM dups d WHERE d.block_hash = md5(p.blk)))
),
rebuilt AS (
  SELECT doc_id,
         array_to_string(list(blk ORDER BY k), ' ') AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
totals AS (
  SELECT doc_id, count(*) AS n_parts FROM parts GROUP BY doc_id
)
SELECT b.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(t.n_parts - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM base b
JOIN totals t ON t.doc_id = b.doc_id
LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
"""


@query("remove_boilerplate", oracle=REMOVE_BOILERPLATE_ORACLE)
def remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_dedup's TRANSFORM half: rewrite every document with its
    cross-document duplicated {SPAN_B}-word blocks removed — the
    boilerplate strip (license headers, navigation chrome, repeated
    footers) that follows span detection in every curation pipeline.

    A document is re-tiled into its phase-0 blocks plus the (< {SPAN_B}
    words) tail remainder; a full block is dropped iff its hash is in
    span_dedup's duplicate set (either phase — so blocks duplicated at
    a misaligned offset in the OTHER document are still recognized
    here); the tail always survives (it never entered detection). The
    surviving parts re-join in order. Every document comes back, with
    clean_text = '' when it was pure boilerplate.

    Scale: block generation is the same map-side explode as span_dedup
    (bounded fanout n/{SPAN_B}); the dup check is a hash-key anti-join
    (digest-only shuffle, uniform key); reassembly groups by doc_id
    with a sorted-struct collect whose per-doc size is the document
    itself — the same bound as any per-doc rollup in the engine. No
    window, no skew key, no driver step.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.split("text", " ").alias("w"),
        F.size(F.split("text", " ")).alias("n"),
    )
    nb = (F.col("n") / SPAN_B).cast("int")
    parts = (
        base.select(
            "doc_id",
            "n",
            F.posexplode(
                F.concat(
                    # sequence(1, 0, 1) is illegal in Spark, so docs
                    # shorter than one block get an explicit empty list
                    F.when(
                        nb >= 1,
                        F.transform(
                            F.sequence(F.lit(1), nb, F.lit(1)),
                            lambda k: F.array_join(
                                F.slice(
                                    F.col("w"),
                                    (k - F.lit(1)) * SPAN_B + F.lit(1),
                                    F.lit(SPAN_B),
                                ),
                                " ",
                            ),
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                    F.when(
                        F.col("n") % SPAN_B > 0,
                        F.array(
                            F.array_join(
                                F.slice(
                                    F.col("w"),
                                    nb * SPAN_B + F.lit(1),
                                    F.col("n") - nb * SPAN_B,
                                ),
                                " ",
                            )
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                )
            ).alias("k", "blk"),
        )
        .withColumn("is_full", F.col("k") < (F.col("n") / SPAN_B).cast("int"))
        .select("doc_id", "k", "blk", "is_full")
    )
    dups = span_dedup(spark, sf_dir).select("block_hash")
    full = parts.where("is_full")
    tail = parts.where(~F.col("is_full"))
    kept = (
        full.withColumn("block_hash", F.md5("blk"))
        .join(dups, "block_hash", "left_anti")
        .select("doc_id", "k", "blk")
        .unionByName(tail.select("doc_id", "k", "blk"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "blk"))),
                lambda s: s["blk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = parts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_parts"))
    return (
        base.select("doc_id")
        .join(totals, "doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (
                F.col("n_parts") - F.coalesce(F.col("n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


# --- Arbitrary-offset substring dedup (suffix-array grade) -----------------
#
# span_dedup catches duplicated SPAN_B-word blocks at two stride phases;
# spans sitting at any OTHER relative offset slip through (its
# documented residual). substring_dedup closes that gap with the
# classic suffix-array reduction (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): a span of >= SUB_L
# tokens duplicated anywhere in the corpus — at ANY offset, across or
# within documents — iff every stride-1 SUB_L-token window inside it
# occurs at least twice globally. So: hash every stride-1 window, keep
# windows whose hash repeats, and merge each document's consecutive
# duplicated offsets into MAXIMAL spans (gaps-and-islands). This finds
# exactly the duplicated spans a suffix array would, with relational
# operators only.

SUB_L = SPAN_B  # minimum duplicated-span length, in tokens

SUBSTRING_DEDUP_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents WHERE len(string_split(text, ' ')) >= {SUB_L}
),
wins AS (
  SELECT doc_id, o,
         md5(array_to_string(w[o : o + {SUB_L} - 1], ' ')) AS h
  FROM (SELECT doc_id, w,
               CAST(unnest(generate_series(1, n - {SUB_L} + 1)) AS INTEGER)
                   AS o
        FROM base)
),
dups AS (
  SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
),
dwin AS (
  SELECT w.doc_id, w.o FROM wins w JOIN dups d ON d.h = w.h
),
runs AS (
  SELECT doc_id, o,
         o - row_number() OVER (PARTITION BY doc_id ORDER BY o) AS grp
  FROM dwin
)
SELECT doc_id,
       CAST(min(o) AS INTEGER) AS span_start,
       CAST(max(o) - min(o) + {SUB_L} AS INTEGER) AS span_len,
       CAST(count(*) AS BIGINT) AS n_windows
FROM runs
GROUP BY doc_id, grp
"""


@query("substring_dedup", oracle=SUBSTRING_DEDUP_ORACLE)
def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated substrings of >= {SUB_L} tokens at ANY offset
    (VERDICT r9 #6 — the suffix-array-grade operator span_dedup
    approximates): emit, per document, every maximal token span all of
    whose stride-1 {SUB_L}-token windows occur at least twice in the
    corpus (across documents or at another offset of the same one —
    the Lee et al. 2022 semantics; a window repeated inside one
    document is self-plagiarism a curation pass also strips).
    span_start is the 1-based token offset, span_len the maximal span's
    token count (>= {SUB_L} by construction).

    Correctness identity: a duplicated span of length S contains
    exactly S - {SUB_L} + 1 duplicated windows at CONSECUTIVE offsets,
    and a maximal consecutive run [o1..o2] of duplicated windows is
    exactly the maximal duplicated span [o1, o2 + {SUB_L} - 1] — so
    merging runs (gaps-and-islands: o - row_number() per doc) emits
    precisely the suffix-array answer, with no alignment bookkeeping
    and no phase blind spot (tests/test_corpus.py plants a span at a
    misaligned offset span_dedup provably misses and pins exact
    start/len here).

    Scale: window generation is a map-side explode (fanout = token
    count; each window hashed once — at PB scale the md5-of-slice
    becomes a rolling/Karp-Rabin hash or minimizer sampling, same plan
    shape); only (digest, doc_id, offset) ever shuffles, never window
    text, and the digest groupBy key is uniform by construction. The
    run-merge window partitions by doc_id — bounded by document token
    count, the same envelope as any per-doc rollup. The global dup
    filter is a digest semi-join (broadcast-able when the duplicated
    sliver is small, the common corpus case)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("w")).where(
        F.size("w") >= SUB_L
    )
    wins = base.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(F.lit(1), F.size("w") - SUB_L + 1)
        ).alias("o"),
    ).select(
        "doc_id",
        "o",
        F.md5(
            F.array_join(F.slice(F.col("w"), F.col("o"), SUB_L), " ")
        ).alias("h"),
    )
    wins = track_cache(wins)
    dups = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("h")
    )
    dwin = wins.join(dups, "h", "left_semi").select("doc_id", "o")
    w_run = Window.partitionBy("doc_id").orderBy("o")
    runs = dwin.withColumn(
        "grp", F.col("o") - F.row_number().over(w_run)
    )
    return runs.groupBy("doc_id", "grp").agg(
        F.min("o").cast("int").alias("span_start"),
        (F.max("o") - F.min("o") + SUB_L).cast("int").alias("span_len"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select("doc_id", "span_start", "span_len", "n_windows")


SUBSTRING_SCRUB_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
),
wins AS (
  SELECT doc_id, o,
         md5(array_to_string(w[o : o + {SUB_L} - 1], ' ')) AS h
  FROM (SELECT doc_id, w,
               CAST(unnest(generate_series(1, n - {SUB_L} + 1)) AS INTEGER)
                   AS o
        FROM base WHERE n >= {SUB_L})
),
dups AS (
  SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
),
dwin AS (
  SELECT w.doc_id, w.o, w.h FROM wins w JOIN dups d ON d.h = w.h
),
keep1 AS (
  SELECT h, doc_id, o FROM (
    SELECT h, doc_id, o,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, o) AS rk
    FROM dwin)
  WHERE rk = 1
),
removable AS (
  SELECT d.doc_id, d.o FROM dwin d
  LEFT JOIN keep1 k ON k.h = d.h AND k.doc_id = d.doc_id AND k.o = d.o
  WHERE k.h IS NULL
),
covered AS (
  SELECT DISTINCT doc_id,
         CAST(unnest(generate_series(o, o + {SUB_L} - 1)) AS INTEGER) AS t
  FROM removable
),
toks AS (
  SELECT doc_id, CAST(t AS INTEGER) AS t, tok
  FROM (SELECT doc_id, unnest(w) AS tok,
               unnest(generate_series(1, n)) AS t
        FROM base)
),
keptt AS (
  SELECT tk.doc_id, tk.t, tk.tok FROM toks tk
  LEFT JOIN covered c ON c.doc_id = tk.doc_id AND c.t = tk.t
  WHERE c.doc_id IS NULL
),
rebuilt AS (
  SELECT doc_id,
         array_to_string(list(tok ORDER BY t), ' ') AS clean_text,
         count(*) AS n_kept
  FROM keptt GROUP BY doc_id
)
SELECT b.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(b.n - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM base b
LEFT JOIN rebuilt r ON r.doc_id = b.doc_id
"""


@query("substring_scrub", oracle=SUBSTRING_SCRUB_ORACLE)
def substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring_dedup's TRANSFORM half (the any-offset sibling of
    remove_boilerplate): rewrite every document with duplicated spans
    removed, keeping exactly the CORPUS-FIRST occurrence of every
    duplicated window (keeper = min (doc_id, offset) per window hash —
    Lee et al. 2022's keep-one-copy policy in relational form). A
    token is dropped iff a removable (non-keeper) duplicated window
    covers it; the keeper document's own copy of a span survives
    untouched, later copies — across documents or at another offset of
    the same document — vanish. Every document comes back with its
    removed-token count.

    Scale: windows/dups are substring_dedup's digest-only pipeline;
    the keeper choice is one rank per window hash (uniform digest
    key); coverage explodes removable windows x {SUB_L} token indices
    (bounded by duplicate volume, not corpus size); the rebuild is a
    per-doc ordered collect, the same envelope as remove_boilerplate's
    reassembly."""
    d = load_table(spark, sf_dir, "documents")
    base = track_cache(
        d.select(
            "doc_id",
            F.split("text", " ").alias("w"),
            F.size(F.split("text", " ")).alias("n"),
        )
    )
    wins = (
        base.where(F.col("n") >= SUB_L)
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(F.lit(1), F.col("n") - SUB_L + 1)
            ).alias("o"),
        )
        .select(
            "doc_id",
            "o",
            F.md5(
                F.array_join(F.slice(F.col("w"), F.col("o"), SUB_L), " ")
            ).alias("h"),
        )
    )
    wins = track_cache(wins)
    dups = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("h")
    )
    dwin = track_cache(wins.join(dups, "h", "left_semi"))
    w_keep = Window.partitionBy("h").orderBy("doc_id", "o")
    keep1 = (
        dwin.withColumn("rk", F.row_number().over(w_keep))
        .where(F.col("rk") == 1)
        .select("h", "doc_id", "o")
    )
    removable = dwin.join(keep1, ["h", "doc_id", "o"], "left_anti")
    covered = (
        removable.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("o"), F.col("o") + SUB_L - 1)
            ).alias("t"),
        )
        .distinct()
    )
    toks = base.select(
        "doc_id",
        F.posexplode("w").alias("t0", "tok"),
    ).select("doc_id", (F.col("t0") + 1).alias("t"), "tok")
    keptt = toks.join(covered, ["doc_id", "t"], "left_anti")
    rebuilt = keptt.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        base.select("doc_id", "n")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("n") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


# --- DSIR: importance-resampling weights over hashed features -------------
#
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# score every raw document by how target-like its hashed-feature
# distribution is, then sample proportionally. Features here are
# hashed unigrams into DSIR_BUCKETS buckets (the paper uses hashed
# bigrams into 10k buckets — same shape, bucket count is the only
# knob and would scale with corpus vocabulary); the "target" corpus
# is the lexicographically-first source (a deterministic stand-in for
# "high-quality domain" that both engines derive identically).
#
# The paper's log-likelihood-ratio weight needs libm; the engine-exact
# form keeps the RATIO in integers: per bucket
#   ratio_e6[b] = (1e6 * t_b) div r_b        (t_b <= r_b, so <= 1e6)
# and per doc
#   score_e6 = sum_b c_doc[b] * ratio_e6[b],  weight_e6 = score div n.
# The global (R/T) normalization constant is rank-invariant and
# omitted, as tfidf_topterms/bm25 omit their log for the same reason.
# Overflow envelope: 1e6 * t_b needs t_b < 9.2e12 — about 2 PB of
# text per bucket before the bound, and DSIR_BUCKETS grows with the
# corpus anyway.

DSIR_BUCKETS = 64

DSIR_ORACLE = f"""
WITH tgt AS (
  SELECT min(source) AS target_src FROM documents WHERE length(text) > 0
),
wrds AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT)
             % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE length(text) > 0)
  WHERE length(word) > 0
),
rw AS (SELECT b, count(*) AS r FROM wrds GROUP BY b),
ts AS (
  SELECT b, count(*) AS t FROM wrds, tgt
  WHERE source = target_src GROUP BY b
),
ratios AS (
  SELECT rw.b,
         CAST((1000000 * coalesce(ts.t, 0)) // rw.r AS BIGINT) AS ratio_e6
  FROM rw LEFT JOIN ts ON ts.b = rw.b
),
dc AS (SELECT doc_id, b, count(*) AS c FROM wrds GROUP BY doc_id, b)
SELECT d.doc_id,
       CAST(sum(d.c) AS BIGINT) AS n_tokens,
       CAST(sum(d.c * r.ratio_e6) AS BIGINT) AS score_e6,
       CAST(sum(d.c * r.ratio_e6) // sum(d.c) AS BIGINT) AS weight_e6
FROM dc d JOIN ratios r ON r.b = d.b
GROUP BY d.doc_id
"""


@query("dsir_weights", oracle=DSIR_ORACLE)
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling weight per document (see the module
    comment above for the paper mapping and the integer-exact ratio
    form). Emits (doc_id, n_tokens, score_e6, weight_e6); a sampler
    consumes weight_e6 exactly like weighted_sample_systematic
    consumes n_chars.

    Scale: tokens shuffle once for the (doc_id, bucket) rollup
    (map-side combinable; the bucket key is a 60-bit md5 prefix mod
    {DSIR_BUCKETS}); the raw and target bucket marginals are
    DSIR_BUCKETS-row aggregates joined back as ONE broadcast; the
    target selector is a 1-row broadcast crossJoin. Nothing wider
    than the corpus' own token count ever moves, and the per-doc
    score is a bigint sum — order-independent under any
    partitioning."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    b = (
        F.conv(
            F.substring(F.md5(F.col("word").cast("binary")), 1, 15), 16, 10
        ).cast("bigint")
        % DSIR_BUCKETS
    )
    wrds = (
        d.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
        )
        .where(F.length("word") > 0)
        .select("doc_id", "source", b.alias("b"))
    )
    wrds = track_cache(wrds)
    tgt = d.agg(F.min("source").alias("target_src"))
    rw = wrds.groupBy("b").agg(F.count(F.lit(1)).alias("r"))
    ts = (
        wrds.crossJoin(F.broadcast(tgt))
        .where(F.col("source") == F.col("target_src"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    ratios = rw.join(ts, "b", "left").select(
        "b",
        F.expr(f"(1000000 * coalesce(t, 0)) div r").alias("ratio_e6"),
    )
    dc = wrds.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    return (
        dc.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("ratio_e6"))
            .cast("bigint")
            .alias("score_e6"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_e6",
            F.expr("score_e6 div n_tokens").alias("weight_e6"),
        )
    )


from .pipeline import WS_K as _WS_K  # no cycle: pipeline never imports corpus

DSIR_SAMPLE_ORACLE = f"""
WITH dw AS (
  SELECT doc_id, weight_e6 FROM ({DSIR_ORACLE})
),
w AS (
  SELECT doc_id, weight_e6 AS weight,
         sum(weight_e6) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hi
  FROM dw
),
p0 AS (
  SELECT CASE WHEN coalesce(sum(weight_e6), 0) < {_WS_K}
              THEN CAST(error('weighted_sample: total weight < sample points (stride 0)') AS BIGINT)
              ELSE sum(weight_e6) // {_WS_K} END AS stride
  FROM dw
),
p AS (SELECT stride, stride // 2 AS off FROM p0)
SELECT doc_id, CAST(weight AS BIGINT) AS weight,
       CAST(cum_hi AS BIGINT) AS cum_hi,
       CAST(least((cum_hi - 1 - off + stride) // stride, {_WS_K})
            - least((cum_hi - weight - 1 - off + stride) // stride, {_WS_K})
            AS BIGINT) AS n_picks
FROM w, p
WHERE least((cum_hi - 1 - off + stride) // stride, {_WS_K})
      - least((cum_hi - weight - 1 - off + stride) // stride, {_WS_K}) >= 1
"""


@query("dsir_sample", oracle=DSIR_SAMPLE_ORACLE)
def dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR pipeline completed: importance-RESAMPLE the corpus by
    the dsir_weights scores — exact weight-proportional systematic
    sampling (weighted_sample_frame, the zero-variance grid sampler)
    with weight = weight_e6 and the shared WS_K sample points. Zero-weight documents
    (no bucket overlap with the target) occupy zero length on the
    sample line and can never be picked, so the output is the
    target-like subsample the paper's sampler would draw with a
    deterministic grid in place of its Gumbel draw.

    Scale: dsir_weights' bounded pipeline plus the audited
    pack_sequences two-phase cumsum — the only unpartitioned window
    rides the O(#shards) per-shard totals."""
    from .pipeline import WS_K, weighted_sample_frame

    dw = dsir_weights(spark, sf_dir).select(
        "doc_id", F.col("weight_e6").alias("weight")
    )
    return weighted_sample_frame(dw, WS_K)
