"""Corpus-curation operators a large-scale training-data pipeline runs
between ingest and dedup (BASELINE.json north star; complements the
dedup/similarity family in operators/llm.py and operators/ann.py).

All three are shuffle-light by construction:

  * stratified_sample — pure filter (no shuffle): the keep/drop
    decision is a deterministic keyed-hash threshold, so the sample is
    reproducible run-over-run and across engines (the same md5-prefix
    trick placement_pick uses). Per-stratum rates are a tiny CASE, not
    a join against a rates table.
  * pii_scrub — pure projection (no shuffle): regexp redaction of
    emails / IPv4s / long digit runs, with a redaction count per doc.
  * repetition_score — pure projection (no shuffle): Gopher/C4-style
    repeated-word fraction from split + array_distinct, flagging the
    boilerplate/spam tail for downstream filtering.

At 100 TB each is a single map-stage over the documents scan with full
predicate/column pushdown — they compose with any downstream groupBy
without adding exchanges of their own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query, track_cache
from ..tables import load_table

# stratum -> md5-prefix threshold (2 hex chars = rate*256). en is the
# dominant stratum so it downsamples hard; the tail keeps more.
SAMPLE_THRESHOLDS = {"en": "1a", "de": "80", "fr": "80"}
SAMPLE_DEFAULT_THRESHOLD = "c0"

STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE lang
        WHEN 'en' THEN '{SAMPLE_THRESHOLDS["en"]}'
        WHEN 'de' THEN '{SAMPLE_THRESHOLDS["de"]}'
        WHEN 'fr' THEN '{SAMPLE_THRESHOLDS["fr"]}'
        ELSE '{SAMPLE_DEFAULT_THRESHOLD}'
      END
"""


@query("stratified_sample", oracle=STRATIFIED_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling: keep a doc iff the
    first two hex chars of md5('sample|'||doc_id) fall under the
    stratum's threshold (threshold/256 = keep rate). Seeded-hash
    sampling instead of rand(): reproducible, engine-independent, and
    stable under retries/speculative tasks — the 100 TB requirement
    rand() cannot meet."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.format_string("sample|%d", F.col("doc_id"))), 1, 2
    )
    thr = F.when(
        F.col("lang") == "en", SAMPLE_THRESHOLDS["en"]
    ).when(
        F.col("lang") == "de", SAMPLE_THRESHOLDS["de"]
    ).when(
        F.col("lang") == "fr", SAMPLE_THRESHOLDS["fr"]
    ).otherwise(SAMPLE_DEFAULT_THRESHOLD)
    return d.where(bucket < thr).select("doc_id", "lang", "source")


EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
LONGNUM_RE = "[0-9]{9,}"
PII_RE = f"({EMAIL_RE}|{IPV4_RE}|{LONGNUM_RE})"

PII_ORACLE = f"""
SELECT doc_id,
       regexp_replace(text, '{PII_RE}', '<PII>', 'g') AS text_clean,
       CAST(len(regexp_extract_all(text, '{PII_RE}')) AS INTEGER)
           AS n_redactions
FROM documents
"""


@query("pii_scrub", oracle=PII_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails, IPv4 addresses, and 9+-digit runs
    (phone/SSN-shaped) replaced with a sentinel token, plus the
    per-doc redaction count for curation stats. Patterns are kept in
    the RE2 ∩ Java-regex common dialect so Spark and the DuckDB oracle
    scrub identically."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace("text", PII_RE, "<PII>").alias("text_clean"),
        F.regexp_count("text", F.lit(PII_RE)).cast("int").alias("n_redactions"),
    )


REPETITION_ORACLE = """
SELECT doc_id,
       CAST(n_words AS INTEGER) AS n_words,
       CAST(n_distinct AS INTEGER) AS n_distinct,
       CAST(1.0 - n_distinct / n_words AS DOUBLE) AS repetition
FROM (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_distinct
  FROM documents
  WHERE len(text) > 0
)
"""


@query("repetition_score", oracle=REPETITION_ORACLE)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition metric: 1 - distinct/total words.
    High values flag boilerplate and keyword-stuffed spam for the
    quality filter. split + array_distinct are JVM built-ins — the
    whole op lives inside one codegen stage."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("int").alias("n_words"),
        F.size(F.array_distinct(words)).cast("int").alias("n_distinct"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(words)).cast("double")
            / F.size(words).cast("double")
        ).alias("repetition"),
    )


# The end-to-end keep/drop verdict a curation pipeline applies after
# the per-signal passes. Thresholds mirror quality_score /
# repetition_score; recomputed inline so the whole filter is ONE
# map-stage (at 100 TB you fuse the signal passes, not join their
# materialized outputs, unless a signal is reused elsewhere).
FILTER_MIN_QUALITY = 0.7
FILTER_MAX_REPETITION = 0.8

CORPUS_FILTER_ORACLE = f"""
SELECT doc_id, lang, quality, repetition,
       (quality >= {FILTER_MIN_QUALITY}
        AND repetition <= {FILTER_MAX_REPETITION}) AS keep
FROM (
  SELECT doc_id, lang,
         CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 1000
              THEN 0.4 ELSE 0.0 END
       + CASE WHEN len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                   / len(string_split(text, ' ')) < 0.3
              THEN 0.3 ELSE 0.0 END
       + CASE WHEN len(regexp_extract_all(text,
                        '\\b(the|a|of|to|and|in|is|it)\\b'))
                   / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.6
              THEN 0.3 ELSE 0.0 END AS quality,
         1.0 - len(list_distinct(string_split(text, ' ')))
             / len(string_split(text, ' ')) AS repetition
  FROM documents WHERE len(text) > 0
)
"""


@query("corpus_filter", oracle=CORPUS_FILTER_ORACLE)
def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the curation signals into the final keep/drop
    verdict (the step that actually gates training data): Gopher-style
    quality score AND repetition bound, evaluated in a single fused
    map-stage — no joins between signal passes, no shuffle."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    punct = F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]"))
    stop = F.regexp_count("text", F.lit(r"\b(the|a|of|to|and|in|is|it)\b"))
    quality = (
        F.when(n_words.between(5, 1000), 0.4).otherwise(0.0)
        + F.when(punct.cast("double") / n_words < 0.3, 0.3).otherwise(0.0)
        + F.when(
            (stop.cast("double") / n_words).between(0.01, 0.6), 0.3
        ).otherwise(0.0)
    )
    repetition = (
        F.lit(1.0)
        - F.size(F.array_distinct(words)).cast("double") / n_words.cast("double")
    )
    return d.select(
        "doc_id",
        "lang",
        quality.alias("quality"),
        repetition.alias("repetition"),
        (
            (quality >= FILTER_MIN_QUALITY)
            & (repetition <= FILTER_MAX_REPETITION)
        ).alias("keep"),
    )


VOCAB_K = 100

VOCAB_ORACLE = f"""
SELECT word, n, rank FROM (
  SELECT word, n,
         row_number() OVER (ORDER BY n DESC, word ASC) AS rank
  FROM (
    SELECT word, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
  )
)
WHERE rank <= {VOCAB_K}
"""


@query("vocab_topk", oracle=VOCAB_ORACLE)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global top-K tokens by frequency (the first
    step of training a tokenizer over the corpus).

    Scale shape: explode -> partial+final count aggregation (map-side
    combine absorbs the token fan-out), then a global top-K that Spark
    executes as TakeOrderedAndProject — per-partition heaps merged on
    one reducer, never a full sort of the vocabulary. Ties break on the
    token string so ranks are deterministic."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.orderBy(F.desc("n"), F.asc("word"))
        .limit(VOCAB_K)
        .select(
            "word",
            "n",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.asc("word")))
            .alias("rank"),
        )
    )


CENTROID_SCALE = 1_000_000  # fixed-point quantum for order-independent sums

LABEL_CENTROIDS_ORACLE = f"""
SELECT label, dim,
       CAST(CAST(s AS DOUBLE) / {CENTROID_SCALE} / n AS DOUBLE) AS centroid
FROM (
  SELECT label, dim,
         sum(CAST(floor(x * {CENTROID_SCALE}) AS BIGINT)) AS s,
         count(*) AS n
  FROM (
    SELECT label,
           unnest(generate_series(1, len(embedding))) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
  )
  GROUP BY label, dim
)
"""


@query("label_centroids", oracle=LABEL_CENTROIDS_ORACLE)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled embedding centroid per label (class prototypes for
    nearest-centroid classification / clustering seeds).

    posexplode fans each vector into (dim, x) rows; the per-(label,
    dim) mean is computed as a fixed-point bigint sum divided at the
    end, so the distributed fold is order-independent and bit-identical
    to the serial oracle — the same determinism contract as all vector
    math in this engine (functions/vector.py)."""
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        (F.col("pos") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("x").cast("double") * CENTROID_SCALE)
        .cast("bigint")
        .alias("q"),
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "dim",
            (
                F.col("s").cast("double") / CENTROID_SCALE / F.col("n")
            ).alias("centroid"),
        )
    )


OOV_ORACLE = f"""
WITH vocab AS (
  SELECT word FROM (
    SELECT word, n,
           row_number() OVER (ORDER BY n DESC, word ASC) AS rank
    FROM (
      SELECT word, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> ''
      GROUP BY word
    )
  )
  WHERE rank <= {VOCAB_K}
),
words AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
)
SELECT w.doc_id,
       CAST(count(*) AS INTEGER) AS n_words,
       CAST(count(*) - count(v.word) AS INTEGER) AS n_oov,
       CAST(CAST(count(*) - count(v.word) AS DOUBLE) / count(*) AS DOUBLE)
           AS oov_rate
FROM words w LEFT JOIN vocab v ON w.word = v.word
GROUP BY w.doc_id
"""


@query("oov_rate", oracle=OOV_ORACLE)
def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-K
    vocabulary — the integer-derived stand-in for an LM perplexity
    filter (docs full of tokens the tokenizer has never seen are noise
    or the wrong language). Composes vocab_topk: the K-row vocabulary
    is broadcast into the exploded word stream, so the only shuffle is
    the per-doc re-aggregation. All counts are integers, so the rate is
    bit-identical across engines (no transcendental math)."""
    d = load_table(spark, sf_dir, "documents")
    vocab = vocab_topk(spark, sf_dir).select("word")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    return (
        words.join(
            F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "word", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            (F.count(F.lit(1)) - F.count("in_vocab")).cast("int").alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_oov",
            (
                F.col("n_oov").cast("double") / F.col("n_words").cast("double")
            ).alias("oov_rate"),
        )
    )


# deterministic 3-way split: first two hex chars of a keyed md5 carve
# [00, e6) / [e6, f3) / [f3, ff] ~ 90/5/5 — the one copy lives in
# splits.py (decontaminate_semantic in ann.py shares it cycle-free)
from .splits import SPLIT_BOUNDS  # noqa: E402

DATASET_SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN b < '{SPLIT_BOUNDS[0]}' THEN 'train'
            WHEN b < '{SPLIT_BOUNDS[1]}' THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents)
"""


@query("dataset_split", oracle=DATASET_SPLIT_ORACLE)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/5/5 train/val/test assignment by keyed hash —
    membership is a pure function of doc_id, so the split is stable
    across runs, engines, and re-shards (no rand(), no global sort,
    no shuffle: the verdict is computed where the row lives)."""
    d = load_table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.format_string("split|%d", F.col("doc_id"))), 1, 2)
    return d.select(
        "doc_id",
        F.when(b < SPLIT_BOUNDS[0], "train")
        .when(b < SPLIT_BOUNDS[1], "val")
        .otherwise("test")
        .alias("split"),
    )


PACK_TOKEN_BUDGET = 256  # tokens per packed training sequence

SEQUENCE_PACK_ORACLE = f"""
SELECT doc_id, lang, n_tokens,
       CAST(floor((cum - n_tokens) / {PACK_TOKEN_BUDGET}.0) AS INTEGER)
           AS seq_id
FROM (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM (
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents WHERE len(text) > 0
  )
)
"""


# doc_ids per shard. Shards are CONTIGUOUS doc_id ranges, so within a
# language every doc in shard s sorts before every doc in shard s+1 —
# splitting the running sum at shard boundaries is exact (associativity),
# not approximate. Growth rule at 100 TB: pick span so one shard's rows
# fit a reducer (~1-10 M docs); the offset table is then
# #langs x #shards ~ corpus/span rows — still broadcastable at 100 TB
# (e.g. 1e11 docs / 1e6 span = 1e5 rows).
PACK_SHARD_SPAN = 512


def pack_sequences(base: DataFrame, shard_span: int) -> DataFrame:
    """Two-level sequence packing over (doc_id, lang, n_tokens) rows.

    Phase 1: cumulative token sum within (lang, shard) — bounded window
    partitions, no language-wide funnel. Phase 2: per-shard base offset
    = total tokens of all preceding shards in the language, computed on
    the tiny (lang, shard) aggregate and broadcast back. base + local
    running sum == the language-wide running sum, row for row, because
    shards are contiguous in the window's sort order.

    The unsharded form (one window PARTITION BY lang) funnels each
    language — ~5 distinct values in this corpus — through a single
    reducer; this is the (lang, shard) fix its docstring used to only
    promise (r3 VERDICT item #2)."""
    sharded = base.withColumn(
        "shard", F.floor(F.col("doc_id") / shard_span).cast("bigint")
    )
    w_local = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sharded.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    totals = sharded.groupBy("lang", "shard").agg(
        F.sum("n_tokens").alias("shard_total")
    )
    w_off = (
        Window.partitionBy("lang")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "lang",
        "shard",
        F.coalesce(F.sum("shard_total").over(w_off), F.lit(0)).alias("base"),
    )
    cum = F.col("base") + F.col("local_cum")
    return local.join(F.broadcast(offsets), ["lang", "shard"]).select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / float(PACK_TOKEN_BUDGET))
        .cast("int")
        .alias("seq_id"),
    )


def pack_sequences_unsharded(base: DataFrame) -> DataFrame:
    """Reference semantics: ONE running sum per language. Correct but
    unshardable (a language's whole stream serializes through one
    reducer); kept as the parity target for tests, not the query path."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / float(PACK_TOKEN_BUDGET)
        )
        .cast("int")
        .alias("seq_id"),
    )


@query("sequence_pack", oracle=SEQUENCE_PACK_ORACLE)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: assign each document to a
    fixed-token-budget training sequence, order-preserving within its
    language stream (seq_id = which budget-sized bin the doc's running
    token total starts in). Runs the sharded two-level window
    (pack_sequences) so no single reducer ever sees a whole language;
    the oracle is the language-wide running sum, which the sharded plan
    reproduces exactly."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    base = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return pack_sequences(base, PACK_SHARD_SPAN)


# Word-gram width for decontamination. 8 consecutive words is the
# conventional benchmark-decontamination unit (long enough that an
# accidental match is vanishingly unlikely in natural text; short
# enough to catch paraphrase-free copying).
DECON_N = 8

DECONTAMINATE_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, text,
         substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
  FROM documents
),
doc_grams AS (
  SELECT DISTINCT doc_id, b,
         array_to_string(w[i : i + {DECON_N} - 1], ' ') AS g
  FROM (SELECT doc_id, b, string_split(text, ' ') AS w,
               unnest(generate_series(
                   1, len(string_split(text, ' ')) - {DECON_N - 1})) AS i
        FROM tagged)
),
test_grams AS (
  SELECT DISTINCT g FROM doc_grams WHERE b >= '{SPLIT_BOUNDS[1]}'
),
train_grams AS (
  SELECT doc_id, g FROM doc_grams WHERE b < '{SPLIT_BOUNDS[0]}'
),
sizes AS (
  SELECT doc_id, count(*) AS n_grams FROM train_grams GROUP BY doc_id
),
hits AS (
  SELECT tg.doc_id, count(*) AS n_shared
  FROM train_grams tg JOIN test_grams t ON tg.g = t.g
  GROUP BY tg.doc_id
)
SELECT h.doc_id, s.n_grams, h.n_shared,
       CAST(h.n_shared AS DOUBLE) / s.n_grams AS contamination
FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
"""


@query("decontaminate", oracle=DECONTAMINATE_ORACLE)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag train-split documents sharing any
    word {DECON_N}-gram with the held-out test split (the standard
    pre-training hygiene pass — GPT-3 App. C / PaLM-style n-gram
    overlap), reusing dataset_split's keyed-hash membership so the two
    queries agree on what "test" means.

    Shape: this is a SEMI-join problem, not a pair-join problem — a
    train doc is contaminated if its gram set intersects the DISTINCT
    test-gram set, so no (train_doc x test_doc) fan-out ever exists
    (contrast dedup_ngram, which must enumerate pairs). At 100 TB:
    grams shuffle as a 120-bit md5 split into two bigints (never
    text) — at the ~1e11-gram scale this operator targets, a 60-bit
    key would already be past its birthday bound (~2^30 grams), so the
    key is two 60-bit halves joined together: collision odds ~1e-15,
    preserving exact-count parity with the text-joining oracle (r4
    ADVICE). Per-doc grams are pre-distincted map-side; the test-gram
    set is 5% of the corpus and the join is a shuffled left-semi on
    the gram hash — a boilerplate gram appearing in millions of train
    docs still joins each of its train rows exactly once (bounded
    fan-out 1, no df cap needed). Cross-engine contract: docs shorter
    than {DECON_N} words have no grams in either engine (Spark
    sequence() would fabricate a descending range — filtered
    explicitly; DuckDB generate_series is empty)."""
    d = load_table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.format_string("split|%d", F.col("doc_id"))), 1, 2)
    base = d.select(
        "doc_id", b.alias("b"), F.split("text", " ").alias("w")
    ).where(F.size("w") >= DECON_N)
    i = F.explode(F.sequence(F.lit(1), F.size("w") - (DECON_N - 1))).alias("i")
    g_txt = F.md5(F.array_join(F.slice(F.col("w"), F.col("i"), DECON_N), " "))
    g_lo = F.conv(F.substring(g_txt, 1, 15), 16, 10).cast("bigint")
    g_hi = F.conv(F.substring(g_txt, 16, 15), 16, 10).cast("bigint")
    doc_grams = (
        base.select("doc_id", "b", "w", i)
        .select("doc_id", "b", g_lo.alias("g_lo"), g_hi.alias("g_hi"))
        .distinct()
    )
    doc_grams = track_cache(doc_grams)
    test_grams = (
        doc_grams.where(F.col("b") >= SPLIT_BOUNDS[1])
        .select("g_lo", "g_hi")
        .distinct()
    )
    train_grams = doc_grams.where(F.col("b") < SPLIT_BOUNDS[0]).select(
        "doc_id", "g_lo", "g_hi"
    )
    sizes = train_grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    hits = (
        train_grams.join(test_grams, ["g_lo", "g_hi"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("n_grams").cast("double")
         ).alias("contamination"),
    )


def _curate_oracle() -> str:
    from .llm import DEDUP_CLUSTERS_ORACLE

    return f"""
WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
kept AS (SELECT doc_id FROM ({CORPUS_FILTER_ORACLE}) WHERE keep),
nonreps AS (SELECT doc_id FROM ({DEDUP_CLUSTERS_ORACLE}) c
            WHERE c.doc_id <> c.cluster_id)
SELECT d.doc_id, d.lang FROM documents d
JOIN keepers k ON k.doc_id = d.doc_id
JOIN kept f ON f.doc_id = d.doc_id
WHERE NOT EXISTS (SELECT 1 FROM nonreps n WHERE n.doc_id = d.doc_id)
"""


# One materialized curated set per (application, sf_dir): the curation
# DAG is the single most expensive subplan in the suite and BOTH
# corpus_curate and corpus_curate_capped (and dedup_semantic's curated
# variant, if composed) need exactly the same rows — r8 verdict #4:
# re-deriving it doubled ~9 s of bench. The survivors list is tiny
# ((doc_id, lang) per kept doc), so a localCheckpoint both cuts the
# lineage (the cluster leg's iterative plan) and pins the result for
# the next consumer. Keyed and bounded exactly like views._VIEW_CACHE /
# liveness._STREAM_SESSIONS: one entry, applicationId-scoped so
# session clones share it, evicted on any key change.
_CURATE_MEMO: dict[tuple[str, str], DataFrame] = {}


def _curated_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _CURATE_MEMO.get(key)
    if hit is not None:
        return hit
    from .llm import dedup_clusters, dedup_exact

    d = load_table(spark, sf_dir, "documents")
    kept = corpus_filter(spark, sf_dir).where("keep").select("doc_id")
    keepers = dedup_exact(spark, sf_dir).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    non_reps = (
        dedup_clusters(spark, sf_dir)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    out = (
        d.select("doc_id", "lang")
        .join(keepers, "doc_id", "left_semi")
        .join(kept, "doc_id", "left_semi")
        .join(non_reps, "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    _CURATE_MEMO.clear()
    _CURATE_MEMO[key] = out
    return out


@query("corpus_curate", oracle=_curate_oracle())
def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation decision as ONE query: a document
    survives iff it passes the quality/repetition filter AND is its
    exact-duplicate class keeper AND is not a non-representative
    member of a near-dup cluster — the composition
    tests/test_pipeline_e2e.py exercises, promoted to a single
    driver-verifiable operator (its oracle nests the corpus_filter
    and recursive-CTE cluster oracles, so the whole DAG
    hash-compares against DuckDB).

    Scale: three semi/anti joins on doc_id over independently-audited
    subplans; the filter and exact-dedup legs are map-heavy, the
    cluster leg reuses dedup_clusters' checkpoint-bounded loop. The
    survivors list is materialized ONCE per (application, sf_dir) and
    shared with corpus_curate_capped (_curated_set) — at production
    scale this is the persisted curated table every downstream stage
    reads."""
    return _curated_set(spark, sf_dir)


def _curate_semantic_oracle() -> str:
    from .ann import DEDUP_SEMANTIC_ORACLE

    return f"""
WITH curated AS ({_curate_oracle()}),
sem AS ({DEDUP_SEMANTIC_ORACLE})
SELECT c.doc_id, c.lang FROM curated c
WHERE NOT EXISTS (
  SELECT 1 FROM sem s WHERE s.vec_id = c.doc_id AND NOT s.kept)
"""


@query("corpus_curate_semantic", oracle=_curate_semantic_oracle())
def corpus_curate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_curate composed with SemDeDup (VERDICT r8 #6): the full
    curation DAG followed by the semantic-dedup verdict — a curated
    document additionally survives only if it is not a within-cell
    semantic near-duplicate of a more-central document
    (embeddings.vec_id == documents.doc_id, the doc_embedding_join
    contract). Ordering matters the same way it does for the cap
    variant: semantic dedup ranks only curated survivors' vectors
    would be wrong here — SemDeDup's verdict is a property of the
    embedding space, so it is computed over the full corpus and
    applied as a filter, exactly like the oracle nests it. Reads the
    shared curated-set materialization; the semantic leg is the
    bounded within-cell pipeline audited in dedup_semantic."""
    from .ann import dedup_semantic

    curated = _curated_set(spark, sf_dir)
    dropped = (
        dedup_semantic(spark, sf_dir)
        .where(~F.col("kept"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    return curated.join(dropped, "doc_id", "left_anti")


# --- Temperature-scaled domain resampling (data mixing) -----------------

RESAMPLE_T = 0.7  # mixture temperature (multilingual-LM convention)
_HASH_SPACE = 16 ** 15  # 60-bit md5-prefix fraction denominator

RESAMPLE_ORACLE = f"""
WITH cnts AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
),
rates AS (
  SELECT lang, n_docs,
         CAST(floor(pow(
             CAST((SELECT min(n_docs) FROM cnts) AS DOUBLE) / n_docs,
             1.0 - {RESAMPLE_T}) * {_HASH_SPACE}.0) AS BIGINT) AS keep_th
  FROM cnts
)
SELECT d.doc_id, d.source, d.lang
FROM documents d
JOIN rates r ON r.lang = d.lang
WHERE CAST(('0x' || substr(md5('resample|' || CAST(d.doc_id AS VARCHAR)),
                           1, 15)) AS BIGINT) < r.keep_th
"""


@query("domain_resample", oracle=RESAMPLE_ORACLE)
def domain_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing: downsample each language so the
    surviving corpus follows the n_s^T mixture (T={0.7}) instead of
    the raw n_s counts — the standard rebalancing that keeps majority
    languages from drowning minority ones in pretraining mixes. Keep
    probability p_s = (n_min / n_s)^(1-T): the smallest stratum keeps
    everything, larger strata are thinned so surviving counts are
    proportional to n_s^T — the maximal-retention schedule for that
    target mixture (every p_s <= 1, at least one p_s = 1).

    Membership is the seeded md5-prefix fraction (stratified_sample's
    idiom widened to 60 bits): reproducible, engine-independent,
    stable under retries — and unlike stratified_sample the rates are
    DATA-DEPENDENT, computed from the per-stratum counts in-plan.

    Scale: the rate table is a #strata-row aggregate (map-side
    combined) broadcast back onto the fact scan — no second shuffle of
    the corpus; the keep decision is one JVM hash + integer compare
    per row. The threshold quantizes to a 60-bit integer so the only
    float op (pow) influences a doc's fate solely when its hash lands
    within ~1 ulp x 2^60 of the boundary — vanishing, and no float
    ever reaches the output columns.
    """
    d = load_table(spark, sf_dir, "documents")
    cnts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = cnts.agg(F.min("n_docs").alias("n_min"))
    rates = cnts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            F.pow(
                F.col("n_min").cast("double") / F.col("n_docs"),
                F.lit(1.0 - RESAMPLE_T),
            )
            * F.lit(float(_HASH_SPACE))
        )
        .cast("bigint")
        .alias("keep_th"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.format_string("resample|%d", F.col("doc_id"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return (
        d.join(F.broadcast(rates), "lang")
        .where(h < F.col("keep_th"))
        .select("doc_id", "source", "lang")
    )


# --- Deterministic contrastive negative sampling ------------------------

NEG_K = 4  # negatives drawn per anchor document


NEGATIVE_SAMPLING_ORACLE = f"""
WITH n AS (SELECT count(*) AS n_docs FROM documents),
draws AS (
  SELECT d.doc_id, CAST(k AS INTEGER) AS k,
         CAST(('0x' || substr(md5('neg|' || CAST(d.doc_id AS VARCHAR)
                                  || '|' || CAST(k AS VARCHAR)), 1, 15))
              AS BIGINT) % n.n_docs AS h,
         n.n_docs
  FROM documents d
  CROSS JOIN n
  CROSS JOIN (SELECT unnest(generate_series(1, {NEG_K})) AS k)
)
SELECT doc_id, k,
       CASE WHEN h = doc_id THEN (h + 1) % n_docs ELSE h END AS neg_doc_id
FROM draws
"""


@query("negative_sampling", oracle=NEGATIVE_SAMPLING_ORACLE)
def negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negatives: {NEG_K} pseudo-random
    partner documents per anchor, drawn as md5('neg|'||doc_id||'|'||k)
    mod corpus size with a +1 probe past a self-draw — the random
    half of a contrastive pair generator (hard_negatives mines the
    difficult half). Seeded-hash membership (the stratified_sample /
    domain_resample idiom) makes the draw reproducible run-over-run,
    engine-independent, and retry-stable — properties rand() cannot
    give a training pipeline.

    Assumes dense doc_ids 0..n-1 (the fixture's layout); a sparse-id
    corpus would first mint dense ids (dataset_split's rank idiom)
    and join back. Scale: pure map-side fanout x{NEG_K} with a 1-row
    broadcast count; no shuffle at all beyond that scalar.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    h = F.conv(
        F.substring(
            F.md5(F.format_string("neg|%d|%d", F.col("doc_id"), F.col("k"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint") % F.col("n_docs")
    return (
        d.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_docs",
            F.explode(F.sequence(F.lit(1), F.lit(NEG_K))).alias("k"),
        )
        .select(
            "doc_id",
            F.col("k").cast("int").alias("k"),
            F.when(h == F.col("doc_id"), (h + 1) % F.col("n_docs"))
            .otherwise(h)
            .alias("neg_doc_id"),
        )
    )


# --- Per-domain document caps (Common-Crawl-style curation step) --------

DOMAIN_CAP_N = 15     # max documents kept per source domain
DOMAIN_CAP_SALTS = 8  # stage-1 shards per domain (top-N per domain is a
#                       subset of the union of per-shard top-Ns, so the
#                       two-stage plan is exact)

DOMAIN_CAPS_ORACLE = f"""
SELECT doc_id, source, CAST(rank AS INTEGER) AS domain_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rank
  FROM documents
)
WHERE rank <= {DOMAIN_CAP_N}
"""


def cap_domains(
    d: DataFrame, n: int = DOMAIN_CAP_N, salts: int = DOMAIN_CAP_SALTS
) -> DataFrame:
    """Keep at most `n` documents per `source` domain, chosen by the
    seeded md5 order (a deterministic uniform sample of the domain —
    the Common-Crawl "cap pages per host" rule; dataset_split's keyed
    hash idiom, so membership is reproducible and engine-independent),
    doc_id as the total-order tie-break. Adds `domain_rank` (1..n).

    Scale: a single row_number per domain would sort one whole domain
    in ONE task — exactly the hot-host pathology the cap exists for.
    Two-stage instead: stage 1 ranks within (source, salt) shards
    (hash-distributed, `salts` tasks per hot domain) and keeps n per
    shard; stage 2 re-ranks the surviving <= n*salts rows per domain —
    bounded input per task by construction. Exact: the true top-n of a
    domain is contained in the union of its per-shard top-ns."""
    key = F.md5(F.format_string("cap|%d", F.col("doc_id")))
    w1 = Window.partitionBy("source", "_salt").orderBy("_k", "doc_id")
    w2 = Window.partitionBy("source").orderBy("_k", "doc_id")
    return (
        d.withColumn("_k", key)
        .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salts)))
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= n)
        .withColumn("domain_rank", F.row_number().over(w2).cast("int"))
        .where(F.col("domain_rank") <= n)
        .drop("_k", "_salt", "_r1")
    )


@query("domain_caps", oracle=DOMAIN_CAPS_ORACLE)
def domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap over the raw corpus (VERDICT r6/r7 gap #1): at
    most DOMAIN_CAP_N docs survive per source, deterministically
    sampled by keyed hash — the anti-boilerplate / anti-SEO-farm step
    every web-scale curation pipeline runs before training. See
    cap_domains for the two-stage exact plan."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_domains(d).select("doc_id", "source", "domain_rank")


def _curate_capped_oracle() -> str:
    return f"""
WITH curated AS ({_curate_oracle()})
SELECT doc_id, source, lang, CAST(rank AS INTEGER) AS domain_rank
FROM (
  SELECT c.doc_id, d.source, c.lang,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY md5('cap|' || CAST(c.doc_id AS VARCHAR)), c.doc_id
         ) AS rank
  FROM curated c JOIN documents d ON d.doc_id = c.doc_id
)
WHERE rank <= {DOMAIN_CAP_N}
"""


@query("corpus_curate_capped", oracle=_curate_capped_oracle())
def corpus_curate_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_curate composed with the per-domain cap: the full
    curation DAG (quality filter + exact-dup keeper + near-dup
    cluster representative) followed by cap_domains over the
    SURVIVORS — so the cap ranks only curated documents, exactly as a
    production pipeline orders the stages (capping before dedup would
    waste cap slots on documents dedup was about to drop). The oracle
    nests the whole composition, so the end-to-end DAG hash-compares
    against DuckDB. The curated set itself comes from the shared
    per-application materialization (_curated_set), so running both
    curation queries in one suite derives the DAG once."""
    curated = _curated_set(spark, sf_dir)  # (doc_id, lang)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_domains(curated.join(src, "doc_id")).select(
        "doc_id", "source", "lang", "domain_rank"
    )


# --- Bigram LM quality score (stupid backoff, fixed point) --------------

LM_BIGRAM_K = 4096   # pruned bigram-model size (top-K by count)
LM_UNIGRAM_K = 4096  # pruned unigram-model size (top-K by count)
LM_SCALE = 1_000_000  # fixed-point quantum for probability ratios

LM_SCORE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
tok AS (SELECT doc_id, word, pos FROM w WHERE word <> ''),
uni AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
tot AS (SELECT sum(c) AS t FROM uni),
unimodel AS (
  SELECT word, c FROM (
    SELECT word, c, row_number() OVER (ORDER BY c DESC, word) AS r FROM uni)
  WHERE r <= {LM_UNIGRAM_K}
),
pairs AS (
  SELECT doc_id, word AS w1,
         lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
),
bi AS (
  SELECT w1, w2, count(*) AS c12
  FROM pairs WHERE w2 IS NOT NULL GROUP BY w1, w2
),
bimodel AS (
  SELECT b.w1, b.w2, (b.c12 * {LM_SCALE}) // u.c AS p6_model
  FROM (
    SELECT w1, w2, c12 FROM (
      SELECT w1, w2, c12,
             row_number() OVER (ORDER BY c12 DESC, w1, w2) AS r
      FROM bi)
    WHERE r <= {LM_BIGRAM_K}
  ) b JOIN uni u ON u.word = b.w1
),
scored AS (
  SELECT p.doc_id,
         COALESCE(m.p6_model,
                  (4 * ((COALESCE(um.c, 0) * {LM_SCALE}) // t.t)) // 10)
             AS p6,
         CASE WHEN m.p6_model IS NULL THEN 1 ELSE 0 END AS backoff
  FROM pairs p
  LEFT JOIN bimodel m ON m.w1 = p.w1 AND m.w2 = p.w2
  LEFT JOIN unimodel um ON um.word = p.w2
  CROSS JOIN tot t
  WHERE p.w2 IS NOT NULL
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_pairs,
       CAST(sum(backoff) AS INTEGER) AS n_backoff,
       CAST(sum(p6) AS DOUBLE) / count(*) AS lm_score
FROM scored GROUP BY doc_id
"""


@query("lm_score", oracle=LM_SCORE_ORACLE)
def lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model fluency score per document (VERDICT r6/r7
    gap #2 — the KenLM-shaped signal; oov_rate stays alongside as the
    cheaper stand-in): train a PRUNED bigram model on the corpus
    itself (top-4096 bigrams with their exact conditional ratios
    c12/c1, top-4096 unigrams — LM_BIGRAM_K / LM_UNIGRAM_K), then score every
    adjacent token pair with STUPID BACKOFF (Brants et al. 2007):
    the bigram ratio when the pair is in the model, else
    0.4 x unigram(w2)/T (0 for out-of-model w2). lm_score = mean pair
    score; n_backoff counts model misses. Single-token documents have
    no pairs and emit no row (like the oracle).

    Exactness: every probability is a 1e6-scaled integer ratio
    (bigint floor division — label_centroids' fixed-point rule), so
    the only float is the final mean: one IEEE division of identical
    integers in both engines — hash-exact, no logs/transcendentals.

    Scale: training touches the corpus twice (unigram + bigram
    counts, both map-side combined); both MODELS are top-K pruned
    via orderBy+limit (TakeOrdered — distributed partial top-K, no
    global window) and BROADCAST into the scoring pass, which is one
    doc-partitioned lead window + two broadcast hash joins + one
    per-doc re-aggregation — the corpus is never shuffled on a
    model key. Model size is a constant knob, not data-sized, the
    same contract a production KenLM scorer has."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).where(F.col("word") != "")
    uni = track_cache(
        tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("t"))
    unimodel = uni.orderBy(F.desc("c"), "word").limit(LM_UNIGRAM_K)
    w_next = Window.partitionBy("doc_id").orderBy("pos")
    pairs = tok.select(
        "doc_id",
        F.col("word").alias("w1"),
        F.lead("word").over(w_next).alias("w2"),
    ).where(F.col("w2").isNotNull())
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    bimodel = (
        bi.orderBy(F.desc("c12"), "w1", "w2")
        .limit(LM_BIGRAM_K)
        .join(uni.withColumnRenamed("word", "w1"), "w1")
        .select(
            "w1", "w2", F.expr(f"(c12 * {LM_SCALE}) div c").alias("p6_model")
        )
    )
    scored = (
        pairs.join(F.broadcast(bimodel), ["w1", "w2"], "left")
        .join(
            F.broadcast(
                unimodel.select(
                    F.col("word").alias("w2"), F.col("c").alias("c2")
                )
            ),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.coalesce(
                "p6_model",
                F.expr(
                    f"(4 * ((coalesce(c2, 0) * {LM_SCALE}) div t)) div 10"
                ),
            ).alias("p6"),
            F.when(F.col("p6_model").isNull(), 1).otherwise(0).alias(
                "backoff"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_pairs"),
        F.sum("backoff").cast("int").alias("n_backoff"),
        (F.sum("p6").cast("double") / F.count(F.lit(1))).alias("lm_score"),
    )


# --- Perplexity-style pruning bands over the LM score --------------------

LM_BAND_LOW_PCT = 10   # drop the least-fluent 10% (noise / wrong language)
LM_BAND_HIGH_PCT = 5   # drop the most-fluent 5% (boilerplate / templates)

LM_BAND_ORACLE = f"""
WITH scored AS ({LM_SCORE_ORACLE}),
ranked AS (
  SELECT doc_id, score6,
         percent_rank() OVER (ORDER BY score6, doc_id) AS pr
  FROM (SELECT doc_id,
               CAST((sum6 * {LM_SCALE}) // n_pairs AS BIGINT) AS score6
        FROM (SELECT doc_id, n_pairs,
                     CAST(round(lm_score * n_pairs) AS HUGEINT) AS sum6
              FROM scored))
)
SELECT doc_id, score6,
       CASE WHEN pr < {LM_BAND_LOW_PCT} / 100.0 THEN 'low'
            WHEN pr >= 1.0 - {LM_BAND_HIGH_PCT} / 100.0 THEN 'high'
            ELSE 'keep' END AS band
FROM ranked
"""


@query("lm_quality_band", oracle=LM_BAND_ORACLE)
def lm_quality_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter composition (the CCNet/Gopher recipe): rank
    every document by its LM fluency and band the corpus — drop the
    least-fluent 10% (LM_BAND_LOW_PCT; noise, wrong language) AND the
    most-fluent 5% (LM_BAND_HIGH_PCT; boilerplate, templated text),
    keep the middle. The banding signal is the exact integer
    score6 = (sum_p6 * 1e6) div n_pairs (both already exact bigints
    from lm_score's fixed-point pipeline), so band boundaries cannot
    drift between engines.

    Scale: this is the two-phase global rank's PRODUCTION shape — a
    derived integer score with heavy ties (floor-division quantizes;
    backoff-dominated docs pile onto identical scores), ranked with
    _two_phase_global_rank: tied hot buckets sub-split on doc_id, no
    single-partition window anywhere (the r8 tie-skew fix doing real
    work, not just surviving a pytest). percent_rank is arithmetic
    over the exact (rank, n) pair."""
    from .analytics import (
        _percent_rank_from_rank,
        _two_phase_global_rank,
    )

    s = lm_score(spark, sf_dir)
    # reconstruct the exact 1e6-scaled pair-sum (lm_score = sum/n in
    # double; round() recovers the integer exactly because sum_p6 and
    # n_pairs are both exact and the quotient is correctly rounded)
    d = s.select(
        "doc_id",
        "n_pairs",
        F.round(F.col("lm_score") * F.col("n_pairs"))
        .cast("decimal(38,0)")
        .alias("sum6"),
    ).select(
        "doc_id",
        F.expr(f"(sum6 * {LM_SCALE}) div n_pairs").alias("score6"),
    )
    ranked = _two_phase_global_rank(d, "score6", "doc_id")
    pr = _percent_rank_from_rank()
    return ranked.select(
        "doc_id",
        "score6",
        F.when(pr < LM_BAND_LOW_PCT / 100.0, "low")
        .when(pr >= 1.0 - LM_BAND_HIGH_PCT / 100.0, "high")
        .otherwise("keep")
        .alias("band"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling: bottom-k reservoir and weighted systematic
# ---------------------------------------------------------------------------

RESERVOIR_K = 64  # uniform sample size

RESERVOIR_ORACLE = f"""
SELECT doc_id, md5(printf('samp42|%d', doc_id)) AS sample_key
FROM documents
ORDER BY sample_key
LIMIT {RESERVOIR_K}
"""


@query("reservoir_sample", oracle=RESERVOIR_ORACLE)
def reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform {RESERVOIR_K}-doc sample without replacement as bottom-k
    order statistics over a seeded hash: keep the K docs with the
    smallest md5('samp42|'||doc_id). This is the DISTRIBUTED form of
    reservoir sampling — the classic single-pass reservoir is
    inherently sequential (each admit depends on the running count),
    but bottom-k over a per-row hash yields the identical distribution
    (each doc's key is an exchangeable uniform draw; the K smallest
    are a uniform K-subset) while being mergeable: each partition
    keeps its local bottom-K, the driver merges K-sized heaps
    (TakeOrdered — O(K) per partition, no global sort, no shuffle of
    the data itself). Seeded hash instead of rand() for the same
    reason as stratified_sample: reproducible across engines, retries
    and speculative tasks.

    Scale: at 100 TB this is a scan + per-partition heap of K rows;
    driver merge is O(partitions x K). The sample is also STABLE
    under corpus growth in expectation-preserving ways (a doc's key
    never changes), which makes downstream eval sets diffable
    run-over-run.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5(F.format_string("samp42|%d", F.col("doc_id"))).alias(
                "sample_key"
            ),
        )
        .orderBy("sample_key")
        .limit(RESERVOIR_K)
    )


WS_K = 64  # systematic sample points
WS_SHARD = 64  # docs per cumsum shard (phase-1 window partition)

WEIGHTED_SAMPLE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, n_chars AS weight,
         sum(n_chars) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hi
  FROM documents
),
p0 AS (
  SELECT CASE WHEN coalesce(sum(n_chars), 0) < {WS_K}
              THEN CAST(error('weighted_sample: total weight < sample points (stride 0)') AS BIGINT)
              ELSE sum(n_chars) // {WS_K} END AS stride
  FROM documents
),
p AS (SELECT stride, stride // 2 AS off FROM p0)
SELECT doc_id, weight, CAST(cum_hi AS BIGINT) AS cum_hi,
       CAST(least((cum_hi - 1 - off + stride) // stride, {WS_K})
            - least((cum_hi - weight - 1 - off + stride) // stride, {WS_K})
            AS BIGINT) AS n_picks
FROM w, p
WHERE least((cum_hi - 1 - off + stride) // stride, {WS_K})
      - least((cum_hi - weight - 1 - off + stride) // stride, {WS_K}) >= 1
"""


def weighted_sample_frame(d: DataFrame, n_points: int) -> DataFrame:
    """Core of weighted_sample_systematic over any (doc_id, weight)
    frame (the query wrapper binds weight = n_chars; the pigeonhole
    pytest feeds a planted heavy-doc corpus). Emits every doc hit by
    >= 1 of the n_points systematic sample points, with its exact
    pick multiplicity."""
    sharded = d.withColumn(
        "shard", F.floor(F.col("doc_id") / WS_SHARD).cast("bigint")
    )
    w_local = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sharded.withColumn("local_cum", F.sum("weight").over(w_local))
    totals = sharded.groupBy("shard").agg(F.sum("weight").alias("shard_total"))
    # carry-in over the O(#shards) aggregate — the pack_sequences
    # two-phase idiom; the only unpartitioned window is shard-sized
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "shard",
        F.coalesce(F.sum("shard_total").over(w_off), F.lit(0)).alias("base"),
    )
    # Degenerate-corpus guard (ADVICE r11): a frame whose total weight
    # is < n_points (legal for DSIR — weights CAN be 0 for most docs,
    # unlike n_chars) makes stride = 0; non-ANSI Spark renders `div 0`
    # as NULL so every pick silently filters out (empty sample) while
    # the DuckDB oracle errors on // 0 — divergent engine/oracle
    # behavior. Both sides now raise identically on the degenerate
    # corpus (oracle: the CASE/error() arm in p0).
    params = d.agg(F.sum("weight").alias("tw")).select(
        F.expr(
            f"CASE WHEN tw IS NULL OR tw < {n_points}"
            " THEN CAST(raise_error('weighted_sample: total weight <"
            " sample points (stride 0)') AS BIGINT)"
            f" ELSE tw div {n_points} END"
        ).alias("stride")
    ).withColumn("off", F.expr("stride div 2"))
    cum = (
        local.join(F.broadcast(offsets), "shard")
        .select(
            "doc_id",
            "weight",
            (F.col("base") + F.col("local_cum")).alias("cum_hi"),
        )
        .crossJoin(F.broadcast(params))
    )
    # The grid is EXACTLY n_points sample points p_k = off + k*stride,
    # k in [0, n_points): both floor-counts clamp at n_points, else the
    # residue total - n_points*stride leaves up to r//stride extra grid
    # points past the K-th inside (0, total] and the sampler emits
    # K+1 (or, at stride ~1, up to 2K-1) picks — found by the
    # hypothesis property test, weights=[65]/K=64 gave 65 picks. With
    # the clamp, total picks telescope to exactly
    # min(hi_total, K) - 0 = K for every total >= n_points.
    n_picks = F.expr(
        f"least((cum_hi - 1 - off + stride) div stride, {n_points})"
        f" - least((cum_hi - weight - 1 - off + stride) div stride,"
        f" {n_points})"
    )
    return (
        cum.withColumn("n_picks", n_picks)
        .where(F.col("n_picks") >= 1)
        .select("doc_id", "weight", "cum_hi", "n_picks")
    )


@query("weighted_sample_systematic", oracle=WEIGHTED_SAMPLE_ORACLE)
def weighted_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weight-proportional systematic sampling: lay every doc's
    weight (n_chars) end to end on an integer number line in doc_id
    order, then take {WS_K} equally-spaced sample points (stride =
    total//{WS_K}, offset = stride//2); a doc is picked once per point
    landing inside its weight interval, so its inclusion count is
    proportional to its weight with ZERO variance beyond the
    single-offset draw — the classic systematic (grid) sampler used
    for domain-weighted token sampling, as pure integer arithmetic
    (picks come from two floor divisions on the exact cumulative sum,
    bit-identical in DuckDB; total picks == {WS_K} by telescoping).

    Scale: the global cumulative sum uses the pack_sequences
    two-phase shape — per-shard windows (bounded partitions) plus a
    carry-in over the shard aggregate — so no reducer ever sees the
    whole corpus; the only unpartitioned window is over O(#shards)
    rows (shard span chosen so that aggregate stays millions of times
    smaller than the data; scale the span with corpus size). Output
    is <= {WS_K} rows. A doc with weight >= stride is GUARANTEED >= 1
    pick (pigeonhole — pinned by pytest), the property quota samplers
    built on rand() cannot give.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("weight")
    )
    return weighted_sample_frame(d, WS_K)


# --- the hygiene family's closing compositions (r13) ----------------------

def _decon_report_oracle() -> str:
    from .ann import DECONTAMINATE_SEMANTIC_ORACLE

    return f"""
WITH ng AS (SELECT doc_id FROM ({DECONTAMINATE_ORACLE})),
sem AS (SELECT doc_id FROM ({DECONTAMINATE_SEMANTIC_ORACLE}))
SELECT 'ngram' AS method, CAST(count(*) AS BIGINT) AS n_flagged FROM ng
UNION ALL
SELECT 'semantic', CAST(count(*) AS BIGINT) FROM sem
UNION ALL
SELECT 'both', CAST(count(*) AS BIGINT)
FROM (SELECT sem.doc_id FROM sem JOIN ng ON ng.doc_id = sem.doc_id)
UNION ALL
SELECT 'either', CAST(count(*) AS BIGINT)
FROM (SELECT doc_id FROM ng UNION SELECT doc_id FROM sem)
"""


@query("decontaminate_report", oracle=_decon_report_oracle())
def decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contamination Venn the curation decision actually reads:
    how many train docs each hygiene method flags — verbatim n-gram
    overlap (`decontaminate`), embedding-space paraphrase
    (`decontaminate_semantic`), their intersection, and their union.
    A large semantic-only count is the operational signal that verbatim
    screening alone is leaking paraphrased eval data into training;
    both legs' flag sets are independently oracle-checked queries, and
    this report's oracle nests both, so the Venn itself hash-compares.

    Scale: both legs are audited bounded pipelines (the semantic leg
    rides the sem_assignment memo); this adds four counting aggregates
    over int doc_id sets."""
    from ..functions.legs import parallel_legs
    from .ann import decontaminate_semantic

    # Two independent hygiene pipelines: build them concurrently
    # (functions/legs.py, guide §2.6), then eager-cache both flag sets
    # — each is consumed by four counting subtrees below, several of
    # them broadcast sides that would otherwise recompute the leg.
    built = parallel_legs(
        lambda: decontaminate(spark, sf_dir).select("doc_id"),
        lambda: decontaminate_semantic(spark, sf_dir).select("doc_id"),
    )
    ng = track_cache(built[0])
    sem = track_cache(built[1])

    def tag(df: DataFrame, method: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_flagged")
        ).select(F.lit(method).alias("method"), "n_flagged")

    return (
        tag(ng, "ngram")
        .unionByName(tag(sem, "semantic"))
        .unionByName(tag(ng.join(sem, "doc_id"), "both"))
        .unionByName(tag(ng.union(sem).distinct(), "either"))
    )


def _curate_decon_oracle() -> str:
    from .ann import DECONTAMINATE_SEMANTIC_ORACLE

    return f"""
WITH curated AS ({_curate_oracle()}),
ng AS (SELECT doc_id FROM ({DECONTAMINATE_ORACLE})),
sem AS (SELECT doc_id FROM ({DECONTAMINATE_SEMANTIC_ORACLE}))
SELECT c.doc_id, c.lang FROM curated c
WHERE substr(md5('split|' || CAST(c.doc_id AS VARCHAR)), 1, 2)
          < '{SPLIT_BOUNDS[0]}'
  AND NOT EXISTS (SELECT 1 FROM ng WHERE ng.doc_id = c.doc_id)
  AND NOT EXISTS (SELECT 1 FROM sem WHERE sem.doc_id = c.doc_id)
"""


@query("corpus_curate_decontaminated", oracle=_curate_decon_oracle())
def corpus_curate_decontaminated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE training set a Llama-style pipeline ships, as one query:
    the curated survivors (quality filter + exact-dup keeper +
    near-dup representative — corpus_curate's shared materialization)
    restricted to the TRAIN split and with every contaminated doc
    removed by BOTH hygiene passes — verbatim n-gram overlap and
    embedding-space paraphrase similarity vs the held-out eval split.
    The oracle nests the curation, split, and both decontamination
    oracles, so the final shipped set hash-compares end to end.

    Scale: two anti joins and one keyed-hash filter on int doc_id over
    the memoized curated set; the hygiene legs are the audited bounded
    pipelines (the semantic leg rides sem_assignment's memo, the
    n-gram leg's gram join is the decontaminate semi-join shape)."""
    from ..functions.legs import parallel_legs
    from .ann import decontaminate_semantic

    b = F.substring(
        F.md5(F.format_string("split|%d", F.col("doc_id"))), 1, 2
    )
    # The curated-set materialization and the two hygiene legs are
    # independent pipelines — build them concurrently (guide §2.6).
    curated, ng, sem = parallel_legs(
        lambda: _curated_set(spark, sf_dir),
        lambda: decontaminate(spark, sf_dir).select("doc_id"),
        lambda: decontaminate_semantic(spark, sf_dir).select("doc_id"),
    )
    return (
        curated
        .where(b < SPLIT_BOUNDS[0])
        .join(ng, "doc_id", "left_anti")
        .join(sem, "doc_id", "left_anti")
    )
