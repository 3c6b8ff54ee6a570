"""Derived DFS-domain views.

The reference engine's mutable state (controller FileTable, per-node
chunk maps, heartbeat table — see SURVEY.md §0) is recast as relational
views derived *deterministically* from the driver fixture tables, so
that every DFS operator has an input that both Spark and the DuckDB
oracle can construct bit-identically:

  files            filename -> byte size            (from orders)
  chunks           (filename, sequence_no, size, checksum)
                   mirrors structures/Chunk.java:17-22 identity and
                   Chunk.java:195-214 sizing (1 MB chunks, short tail)
  nodes            the 10-node bass cluster (scripts/start-storage-nodes.sh:8)
  replicas         chunk -> 1..3 replica locations (controller/ChunkRef.java:13-16)
  heartbeats       timestamped node liveness events (controller/Controller.java:23)
  offline_nodes    nodes silent longer than MAX_HEARTBEAT_AGE
                   (controller/HeartbeatMonitor.java:24-58)
  online_nodes     complement (controller/Controller.java:17)
  checksums_stored chunk checksums with injected corruption
                   (storageNode/MessageProcessor.java:209-211 sidecars)
  free_space       per-node free bytes (storageNode/MessageProcessor.java:113-124)

Every derivation uses only arithmetic, printf, and md5 — functions with
identical semantics in Spark SQL and DuckDB (verified: DuckDB CAST on
doubles *rounds* while Spark truncates, so all double->int conversions
go through floor/ceil first).

Scale note: these views are bounded (~200 files x <=500 chunks x 3
replicas) regardless of SF, so every DFS-metadata query runs on small
inputs; the 100 TB path is exercised by the analytics/LLM operators.
The derivation itself is one narrow projection + groupBy over orders —
shuffle of two small columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

CHUNK_SIZE = 1_000_000  # dfs.properties:5
MIN_REPLICAS = 3  # dfs.properties:10
N_NODES = 10
NODE_IDS = [14, 15, 16, 17, 18, 20, 21, 22, 23, 24]  # scripts/start-storage-nodes.sh:8
# Liveness window. The reference uses 30 s against a 5 s heartbeat
# (dfs.properties:1-3, a 6x multiple); our heartbeat stream is the
# events fixture (~1 event/node/43 min at sf0.01), so the analogous
# window is minutes-to-hours, not seconds. 40 min yields ~3 dead
# nodes at sf0.01 and several at sf0.001 — non-trivial at the gate SFs.
MAX_HEARTBEAT_AGE_SQL = "INTERVAL 40 MINUTE"


# Memo of cached derived views per (session, sf_dir). The DFS views
# are metadata-scale (bounded ~1e5 rows at any SF), so pinning them in
# memory is the right call even on a production cluster — this is the
# controller's in-memory FileTable, relationally. Keyed by the Spark
# applicationId, not id(spark): a stopped session's address can be
# reused by a new one, which would hand back DataFrames bound to a dead
# SparkContext.
_VIEW_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cached(name: str, build, spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _VIEW_CACHE.get(key)
    if df is None:
        df = build().cache()
        _VIEW_CACHE[key] = df
    return df


def files_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            (F.col("o_orderkey") % 200).alias("fnum"),
            F.floor(F.col("o_totalprice") * 1000).cast("bigint").alias("sz"),
        )
        .groupBy("fnum")
        .agg(F.max("sz").alias("size"))
        .select(
            "fnum",
            F.format_string("file%04d.dat", F.col("fnum")).alias("filename"),
            "size",
        )
    )


def chunks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk plan per file: 1 MB chunks, short last chunk (cached).

    Mirrors Chunk.java:195-214 (count = ceil(size/chunk), last =
    size - (n-1)*chunk) and the non-empty guard Chunk.java:144-150.
    Keeps an internal ``fnum`` column for downstream derivations.
    """
    return _cached("chunks", lambda: _build_chunks(spark, sf_dir), spark, sf_dir)


def _build_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = files_df(spark, sf_dir).filter(F.col("size") > 0)
    f = f.withColumn(
        "n_chunks", F.ceil(F.col("size") / F.lit(float(CHUNK_SIZE))).cast("int")
    )
    seq = F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("sequence_no")
    df = f.select("fnum", "filename", F.col("size").alias("file_size"), "n_chunks", seq)
    return df.select(
        "fnum",
        "filename",
        F.col("sequence_no").cast("int").alias("sequence_no"),
        F.when(
            F.col("sequence_no") == F.col("n_chunks") - 1,
            F.col("file_size") - (F.col("n_chunks") - 1).cast("bigint") * CHUNK_SIZE,
        )
        .otherwise(F.lit(CHUNK_SIZE))
        .cast("bigint")
        .alias("size"),
        F.md5(
            F.format_string("%s-chunk%d", F.col("filename"), F.col("sequence_no"))
        ).alias("checksum"),
    )


def nodes_df(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    rows = [(f"bass{i:02d}", 9000 + i) for i in NODE_IDS]
    return spark.createDataFrame(rows, "host string, port int")


def replicas_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk -> replica placements (1..3 per chunk, deterministic, cached).

    Placement hash is plain arithmetic so DuckDB reproduces it; the
    three probes collide for ~10-20% of chunks, which keeps
    under_replicated (controller/FileTable.java:41-52) non-trivial.
    """
    return _cached("replicas", lambda: _build_replicas(spark, sf_dir), spark, sf_dir)


def _build_replicas(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = chunks_df(spark, sf_dir)
    k = spark.range(3).select(F.col("id").cast("int").alias("k"))
    idx = (
        F.col("fnum") * (F.lit(3) + F.col("k"))
        + F.col("sequence_no") * (F.lit(5) + F.lit(2) * F.col("k"))
        + F.col("k")
    ) % N_NODES
    placed = c.crossJoin(F.broadcast(k)).select(
        "filename",
        "sequence_no",
        (F.lit(14) + idx + F.when(idx >= 5, 1).otherwise(0)).alias("node_id"),
    )
    return placed.select(
        "filename",
        "sequence_no",
        F.format_string("bass%02d", F.col("node_id")).alias("host"),
        (F.lit(9000) + F.col("node_id")).cast("int").alias("port"),
    ).distinct()


def heartbeats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    idx = F.col("user_id") % N_NODES
    node_id = F.lit(14) + idx + F.when(idx >= 5, 1).otherwise(0)
    return e.select(
        F.format_string("bass%02d", node_id).alias("host"),
        (F.lit(9000) + node_id).cast("int").alias("port"),
        F.col("ts"),
        F.col("event_id").alias("hb_id"),
    )


def offline_nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cached(
        "offline_nodes", lambda: _build_offline_nodes(spark, sf_dir), spark, sf_dir
    )


def _build_offline_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    hb = heartbeats_df(spark, sf_dir)
    last = hb.groupBy("host", "port").agg(F.max("ts").alias("last_ts"))
    cutoff = hb.agg(
        (F.max("ts") - F.expr(MAX_HEARTBEAT_AGE_SQL)).alias("cutoff")
    )
    n = nodes_df(spark)
    return (
        n.join(last, ["host", "port"], "left")
        .crossJoin(F.broadcast(cutoff))
        .filter(F.col("last_ts").isNull() | (F.col("last_ts") < F.col("cutoff")))
        .select("host", "port")
    )


def online_nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nodes_df(spark).join(
        offline_nodes_df(spark, sf_dir), ["host", "port"], "left_anti"
    )


def checksums_stored_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored (sidecar) checksums with deterministic injected corruption."""
    c = chunks_df(spark, sf_dir)
    corrupt = (F.col("fnum") * 31 + F.col("sequence_no")) % 97 == 0
    return c.select(
        "filename",
        "sequence_no",
        F.when(
            corrupt,
            F.md5(
                F.format_string(
                    "corrupt-%s-%d", F.col("filename"), F.col("sequence_no")
                )
            ),
        )
        .otherwise(F.col("checksum"))
        .alias("checksum"),
    )


def free_space_df(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    n = nodes_df(spark)
    return n.select(
        "host",
        "port",
        (
            (F.lit(1) + (F.col("port") * 37) % 90).cast("bigint")
            * F.lit(1_000_000_000)
        ).alias("free_space"),
    )


VIEW_BUILDERS = {
    "files": files_df,
    "chunks": chunks_df,
    "nodes": nodes_df,
    "replicas": replicas_df,
    "heartbeats": heartbeats_df,
    "offline_nodes": offline_nodes_df,
    "online_nodes": online_nodes_df,
    "checksums_stored": checksums_stored_df,
    "free_space": free_space_df,
}


def register_dfs_views(spark: SparkSession, sf_dir: str) -> None:
    for name, builder in VIEW_BUILDERS.items():
        builder(spark, sf_dir).createOrReplaceTempView(name)


# --- DuckDB oracle prelude ------------------------------------------------
# Must produce values identical to the builders above. DuckDB-specific
# bits: unnest(generate_series(...)) for the sequence explode, VALUES
# lists for literals. Unused CTEs are inlined away by DuckDB's planner.

DUCKDB_PRELUDE = f"""
files AS (
  SELECT fnum, printf('file%04d.dat', fnum) AS filename, size FROM (
    SELECT o_orderkey % 200 AS fnum,
           max(CAST(floor(o_totalprice * 1000) AS BIGINT)) AS size
    FROM orders GROUP BY 1)
),
chunks_n AS (
  SELECT fnum, filename, size AS file_size,
         CAST(ceil(size / 1000000.0) AS INTEGER) AS n_chunks
  FROM files WHERE size > 0
),
chunks_seq AS (
  SELECT fnum, filename, file_size, n_chunks,
         CAST(unnest(generate_series(0, n_chunks - 1)) AS INTEGER) AS sequence_no
  FROM chunks_n
),
chunks AS (
  SELECT fnum, filename, sequence_no,
         CAST(CASE WHEN sequence_no = n_chunks - 1
                   THEN file_size - (n_chunks - 1) * {CHUNK_SIZE}
                   ELSE {CHUNK_SIZE} END AS BIGINT) AS size,
         md5(printf('%s-chunk%d', filename, sequence_no)) AS checksum
  FROM chunks_seq
),
nodes AS (
  SELECT printf('bass%02d', id) AS host, CAST(9000 + id AS INTEGER) AS port
  FROM (VALUES (14),(15),(16),(17),(18),(20),(21),(22),(23),(24)) AS t(id)
),
replicas AS (
  SELECT DISTINCT filename, sequence_no,
         printf('bass%02d', node_id) AS host,
         CAST(9000 + node_id AS INTEGER) AS port
  FROM (
    SELECT filename, sequence_no,
           14 + node_idx + CASE WHEN node_idx >= 5 THEN 1 ELSE 0 END AS node_id
    FROM (
      SELECT c.filename, c.sequence_no,
             (c.fnum * (3 + k.k) + c.sequence_no * (5 + 2 * k.k) + k.k) % 10 AS node_idx
      FROM chunks c CROSS JOIN (VALUES (0),(1),(2)) AS k(k)
    )
  )
),
heartbeats AS (
  SELECT printf('bass%02d', node_id) AS host,
         CAST(9000 + node_id AS INTEGER) AS port, ts, hb_id
  FROM (
    SELECT 14 + idx + CASE WHEN idx >= 5 THEN 1 ELSE 0 END AS node_id, ts,
           event_id AS hb_id
    FROM (SELECT user_id % 10 AS idx, ts, event_id FROM events)
  )
),
offline_nodes AS (
  SELECT n.host, n.port FROM nodes n
  LEFT JOIN (SELECT host, port, max(ts) AS last_ts
             FROM heartbeats GROUP BY 1, 2) h
    ON n.host = h.host AND n.port = h.port
  WHERE h.last_ts IS NULL
     OR h.last_ts < (SELECT max(ts) FROM heartbeats) - {MAX_HEARTBEAT_AGE_SQL}
),
online_nodes AS (
  SELECT n.host, n.port FROM nodes n
  WHERE NOT EXISTS (SELECT 1 FROM offline_nodes o
                    WHERE o.host = n.host AND o.port = n.port)
),
checksums_stored AS (
  SELECT filename, sequence_no,
         CASE WHEN (fnum * 31 + sequence_no) % 97 = 0
              THEN md5(printf('corrupt-%s-%d', filename, sequence_no))
              ELSE checksum END AS checksum
  FROM chunks
),
free_space AS (
  SELECT host, port,
         CAST(1 + (port * 37) % 90 AS BIGINT) * 1000000000 AS free_space
  FROM nodes
)
""".strip()


# MATERIALIZED: without it DuckDB inlines every CTE reference and the
# chunks->replicas derivation gets re-expanded per reference — a
# corruption_scan-style 3-view join then takes minutes instead of ~2 s.
_PRELUDE_MATERIALIZED = DUCKDB_PRELUDE.replace(" AS (", " AS MATERIALIZED (")


def oracle(body: str) -> str:
    """Wrap an oracle query with the DFS-view CTE prelude.

    Merges the body's own WITH clause into the prelude's if present.
    """
    body = body.strip()
    if body.upper().startswith("WITH "):
        body = "," + body[len("WITH ") :]
    return f"WITH {_PRELUDE_MATERIALIZED}\n{body}"
