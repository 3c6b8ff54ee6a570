"""Scalar / chunk-math layer (SURVEY.md §2.B, §2.A S1).

The reference's pure functions — MD5 checksums (Utils.java:24-58),
chunk-count math (structures/Chunk.java:195-214), chunk-name
parse/format (storageNode/StorageNode.java:66, Chunk.java:216-219),
unit conversion (Client.java:79-89) — as Spark column expressions.
Everything is a built-in JVM-side function: no UDFs anywhere in this
layer, so the whole plan stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table
from ..views import CHUNK_SIZE, chunks_df, checksums_stored_df, files_df, free_space_df, oracle

CHUNK_PLAN_ORACLE = oracle(
    f"""
SELECT filename, size,
       CAST(ceil(size / {CHUNK_SIZE}.0) AS INTEGER) AS n_chunks,
       size - (CAST(ceil(size / {CHUNK_SIZE}.0) AS BIGINT) - 1) * {CHUNK_SIZE}
           AS last_chunk_size
FROM files WHERE size > 0
"""
)


@query("chunk_plan", oracle=CHUNK_PLAN_ORACLE)
def chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file chunk count and short-tail size (Chunk.java:195-214).

    count = ceil(size/chunk_size); last = size - (n-1)*chunk_size; the
    empty-file guard (Chunk.java:144-150) is the size > 0 filter.
    """
    f = files_df(spark, sf_dir).filter(F.col("size") > 0)
    n = F.ceil(F.col("size") / F.lit(float(CHUNK_SIZE)))
    return f.select(
        "filename",
        "size",
        n.cast("int").alias("n_chunks"),
        (F.col("size") - (n.cast("bigint") - 1) * CHUNK_SIZE).alias("last_chunk_size"),
    )


CHUNK_ASSIGN_ORACLE = """
SELECT l_orderkey, l_linenumber,
       row_number() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber) - 1 AS sequence_no
FROM lineitem
"""


@query("chunk_assign", oracle=CHUNK_ASSIGN_ORACLE)
def chunk_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row -> chunk sequence assignment (Chunk.java:36-76 split loop).

    The reference assigns sequenceNo 0..N-1 while streaming a file;
    relationally that is a ranking window per file. Scale: one shuffle
    on the partition key; per-group state is a counter.
    """
    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.row_number().over(w) - 1).alias("sequence_no"),
    )


CHECKSUM_COMPUTE_ORACLE = """
SELECT doc_id, md5(text) AS checksum FROM documents
"""


@query("checksum_compute", oracle=CHECKSUM_COMPUTE_ORACLE)
def checksum_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5 lowercase-hex digest (Utils.java:24-58 md5sum/toHexString).

    F.md5 is the identical algorithm + formatting, JVM-side. At 100 TB
    this is the one hot-loop scalar; built-in md5 runs inside codegen
    with zero Python transfer.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("checksum"))


CHECKSUM_VERIFY_ORACLE = oracle(
    """
SELECT c.filename, c.sequence_no,
       c.checksum AS computed_checksum,
       s.checksum AS stored_checksum
FROM chunks c JOIN checksums_stored s
  ON c.filename = s.filename AND c.sequence_no = s.sequence_no
WHERE c.checksum <> s.checksum
"""
)


@query("checksum_verify", oracle=CHECKSUM_VERIFY_ORACLE)
def checksum_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows whose recomputed digest != stored digest (Utils.java:66-71,
    Chunk.java:156-164 isCorrupted).

    Join on the chunk identity key then mismatch filter — the filter is
    pushed into the join output before any further stage.
    """
    c = chunks_df(spark, sf_dir)
    s = checksums_stored_df(spark, sf_dir)
    return (
        c.select("filename", "sequence_no", F.col("checksum").alias("computed_checksum"))
        .join(
            s.select(
                "filename", "sequence_no", F.col("checksum").alias("stored_checksum")
            ),
            ["filename", "sequence_no"],
        )
        .where(F.col("computed_checksum") != F.col("stored_checksum"))
    )


CHUNKNAME_FORMAT_ORACLE = oracle(
    """
SELECT filename, sequence_no,
       printf('%s-chunk%d', filename, sequence_no) AS chunk_name,
       printf('%s  %s', checksum, printf('%s-chunk%d', filename, sequence_no))
           AS sidecar_line
FROM chunks
"""
)


@query("chunkname_format", oracle=CHUNKNAME_FORMAT_ORACLE)
def chunkname_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-disk chunk name `<base>-chunk<N>` (Chunk.java:216-219) and the
    md5 sidecar line `<sum>  <name>` (storageNode/MessageProcessor.java:211)."""
    c = chunks_df(spark, sf_dir)
    name = F.format_string("%s-chunk%d", F.col("filename"), F.col("sequence_no"))
    return c.select(
        "filename",
        "sequence_no",
        name.alias("chunk_name"),
        F.format_string("%s  %s", F.col("checksum"), name).alias("sidecar_line"),
    )


CHUNKNAME_PARSE_ORACLE = oracle(
    """
SELECT chunk_name,
       regexp_extract(chunk_name, '(.*?)-chunk([0-9]+)', 1) AS parsed_filename,
       CAST(regexp_extract(chunk_name, '(.*?)-chunk([0-9]+)', 2) AS INTEGER)
           AS parsed_sequence_no
FROM (SELECT printf('%s-chunk%d', filename, sequence_no) AS chunk_name FROM chunks)
"""
)


@query("chunkname_parse", oracle=CHUNKNAME_PARSE_ORACLE)
def chunkname_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recovery-scan name parse via `(.*?)-chunk([0-9]+)`
    (storageNode/StorageNode.java:66,77-82)."""
    c = chunks_df(spark, sf_dir)
    named = c.select(
        F.format_string("%s-chunk%d", F.col("filename"), F.col("sequence_no")).alias(
            "chunk_name"
        )
    )
    pat = r"(.*?)-chunk([0-9]+)"
    return named.select(
        "chunk_name",
        F.regexp_extract("chunk_name", pat, 1).alias("parsed_filename"),
        F.regexp_extract("chunk_name", pat, 2).cast("int").alias("parsed_sequence_no"),
    )


UNIT_CONVERT_ORACLE = oracle(
    """
SELECT host, port, free_space,
       round(free_space / 1e9, 2) AS free_gb,
       round(free_space / 1073741824.0, 2) AS free_gib,
       round(free_space / 1e6, 2) AS free_mb
FROM free_space
"""
)


@query("unit_convert", oracle=UNIT_CONVERT_ORACLE)
def unit_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bytes -> GB/GiB/MB rounded to 2 decimals (Client.java:79-89,179-182)."""
    fs = free_space_df(spark, sf_dir)
    return fs.select(
        "host",
        "port",
        "free_space",
        F.round(F.col("free_space") / 1e9, 2).alias("free_gb"),
        F.round(F.col("free_space") / 1073741824.0, 2).alias("free_gib"),
        F.round(F.col("free_space") / 1e6, 2).alias("free_mb"),
    )


RECOVERY_SCAN_ORACLE = oracle(
    """
SELECT chunk_name,
       regexp_extract(chunk_name, '(.*?)-chunk([0-9]+)', 1) AS filename,
       CAST(regexp_extract(chunk_name, '(.*?)-chunk([0-9]+)', 2) AS INTEGER)
           AS sequence_no,
       (computed = stored) AS checksum_ok
FROM (
  SELECT printf('%s-chunk%d', c.filename, c.sequence_no) AS chunk_name,
         c.checksum AS computed, s.checksum AS stored
  FROM chunks c JOIN checksums_stored s
    ON c.filename = s.filename AND c.sequence_no = s.sequence_no
)
"""
)


@query("recovery_scan", oracle=RECOVERY_SCAN_ORACLE)
def recovery_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Startup chunk-directory recovery (storageNode/StorageNode.java:61-99):
    parse every on-disk chunk name, verify its sidecar checksum."""
    c = chunks_df(spark, sf_dir)
    s = checksums_stored_df(spark, sf_dir)
    joined = c.select(
        F.format_string("%s-chunk%d", F.col("filename"), F.col("sequence_no")).alias(
            "chunk_name"
        ),
        "filename",
        "sequence_no",
        F.col("checksum").alias("computed"),
    ).join(
        s.select("filename", "sequence_no", F.col("checksum").alias("stored")),
        ["filename", "sequence_no"],
    )
    pat = r"(.*?)-chunk([0-9]+)"
    return joined.select(
        "chunk_name",
        F.regexp_extract("chunk_name", pat, 1).alias("filename"),
        F.regexp_extract("chunk_name", pat, 2).cast("int").alias("sequence_no"),
        (F.col("computed") == F.col("stored")).alias("checksum_ok"),
    )
