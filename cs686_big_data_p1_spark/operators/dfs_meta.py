"""DFS control-plane metadata queries (SURVEY.md §2.C–2.E, batch §2.F).

Each query re-expresses one reference operation — the controller's
FileTable bookkeeping, liveness, re-replication planning, the storage
node's inventory and corruption scans — as a declarative DataFrame
pipeline over the derived views (views.py). Citations point at the
reference implementation being mirrored.

Scale notes: all keys here are (filename, sequence_no) or (host,
port). The views are bounded, but the same plans hold at 100 TB
metadata scale: aggs are partial+final; the node-side tables (10 rows
here, O(cluster) in production) are always the broadcast side; anti/
semi joins never materialize the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..views import (
    MIN_REPLICAS,
    chunks_df,
    checksums_stored_df,
    free_space_df,
    heartbeats_df,
    nodes_df,
    offline_nodes_df,
    online_nodes_df,
    oracle,
    replicas_df,
)

# --- aggregations (§2.C) --------------------------------------------------


@query(
    "free_space_total",
    oracle=oracle(
        """
SELECT CAST(sum(f.free_space) AS BIGINT) AS total_free_space,
       count(*) AS n_nodes
FROM free_space f
JOIN online_nodes o ON f.host = o.host AND f.port = o.port
"""
    ),
)
def free_space_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scatter-gather free-space SUM over online nodes
    (controller/MessageProcessor.java:87-130).

    The reference's 4-thread fan-out + sum is exactly Spark's
    partial+final aggregation; the online filter is a broadcast semi
    join (node list is always the small side)."""
    fs = free_space_df(spark, sf_dir)
    online = online_nodes_df(spark, sf_dir)
    return (
        fs.join(F.broadcast(online), ["host", "port"], "left_semi")
        .agg(
            F.sum("free_space").cast("bigint").alias("total_free_space"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
    )


@query(
    "replica_count",
    oracle=oracle(
        """
SELECT filename, sequence_no, count(*) AS n_replicas
FROM replicas GROUP BY filename, sequence_no
"""
    ),
)
def replica_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica-set size per chunk (controller/ChunkRef.java:23-25)."""
    r = replicas_df(spark, sf_dir)
    return r.groupBy("filename", "sequence_no").agg(
        F.count(F.lit(1)).alias("n_replicas")
    )


@query(
    "chunk_count",
    oracle=oracle(
        """
SELECT filename, count(DISTINCT sequence_no) AS n_chunks
FROM chunks GROUP BY filename
"""
    ),
)
def chunk_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk count per file (controller/DFSFile.java:33-35)."""
    c = chunks_df(spark, sf_dir)
    return c.groupBy("filename").agg(
        F.countDistinct("sequence_no").alias("n_chunks")
    )


@query(
    "file_manifest",
    oracle=oracle(
        """
SELECT filename, sequence_no,
       string_agg(addr, ',' ORDER BY addr) AS nodes
FROM (SELECT filename, sequence_no, printf('%s:%d', host, port) AS addr
      FROM replicas)
GROUP BY filename, sequence_no
"""
    ),
)
def file_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list-files rollup: every chunk's sorted replica addresses
    (controller/MessageProcessor.java:167-211, Client.java:106-132
    TreeSet ordering).

    collect_set + sort_array reproduces the TreeSet; the csv join keeps
    the oracle comparison flat. One shuffle on the chunk key."""
    r = replicas_df(spark, sf_dir)
    return (
        r.select(
            "filename",
            "sequence_no",
            F.format_string("%s:%d", F.col("host"), F.col("port")).alias("addr"),
        )
        .groupBy("filename", "sequence_no")
        .agg(F.array_join(F.sort_array(F.collect_set("addr")), ",").alias("nodes"))
    )


def manifest_rollup(per_chunk: DataFrame, n_salt: int = 0) -> DataFrame:
    """A4 stage 2: per-FILE manifest — every chunk's (sequence_no,
    nodes) as one sorted array per file (controller/
    MessageProcessor.java:167-211 builds exactly this response shape).

    The filename key is the skew risk at 100 TB (SURVEY §4.3): one
    pathological file holding millions of chunks funnels the whole
    rollup through a single reducer. With n_salt > 0 the aggregation is
    two-phase: partial collect on (filename, sequence_no % n_salt) —
    spreading a hot file over n_salt reducers — then a final
    flatten+sort per file whose input is n_salt pre-combined rows, not
    millions. Deterministic salt (from the data, not rand()) keeps the
    operator re-runnable. Output is identical to the unsalted path
    (pytest-pinned on a single-file pathology)."""
    entry = F.struct("sequence_no", "nodes")
    if n_salt <= 0:
        return per_chunk.groupBy("filename").agg(
            F.sort_array(F.collect_list(entry)).alias("chunks")
        )
    phase1 = (
        per_chunk.withColumn("salt", F.pmod(F.col("sequence_no"), F.lit(n_salt)))
        .groupBy("filename", "salt")
        .agg(F.collect_list(entry).alias("part"))
    )
    return phase1.groupBy("filename").agg(
        F.sort_array(F.flatten(F.collect_list("part"))).alias("chunks")
    )


@query(
    "list_filenames",
    oracle=oracle("SELECT DISTINCT filename FROM chunks ORDER BY filename"),
)
def list_filenames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ls — sorted distinct filenames (controller/FileTable.java:23-25,
    Client.java:50-53)."""
    c = chunks_df(spark, sf_dir)
    return c.select("filename").distinct().orderBy("filename")


@query(
    "list_storage_nodes",
    oracle=oracle("SELECT host, port FROM nodes ORDER BY host, port"),
)
def list_storage_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list-storage-nodes sorted by (host, port)
    (structures/ComponentAddress.java:47-52, Client.java:124-128)."""
    return nodes_df(spark).orderBy("host", "port")


@query(
    "node_inventory",
    oracle=oracle(
        """
SELECT host, port, filename,
       string_agg(sequence_no, ',' ORDER BY sequence_no) AS sequence_nos
FROM replicas GROUP BY host, port, filename
"""
    ),
)
def node_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node Map<filename, SortedSet<Chunk>> (storageNode/
    StorageNode.java:37,45-59) as a grouped sorted aggregation."""
    r = replicas_df(spark, sf_dir)
    return (
        r.groupBy("host", "port", "filename")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("sequence_no")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("sequence_nos")
        )
    )


@query(
    "incomplete_files",
    oracle=oracle(
        """
WITH surviving AS (
  SELECT DISTINCT r.filename, r.sequence_no
  FROM replicas r
  JOIN online_nodes o ON r.host = o.host AND r.port = o.port
)
SELECT filename,
       min(sequence_no) AS min_seq,
       max(sequence_no) AS max_seq,
       count(*) AS n_chunks
FROM surviving
GROUP BY filename
HAVING min(sequence_no) <> 0 OR count(*) <> max(sequence_no) + 1
"""
    ),
)
def incomplete_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reassembly contiguity check (structures/Chunk.java:79-98): files
    whose reachable chunk set (>=1 online replica) is missing chunk 0
    or has sequence gaps."""
    r = replicas_df(spark, sf_dir)
    online = online_nodes_df(spark, sf_dir)
    surviving = (
        r.join(F.broadcast(online), ["host", "port"], "left_semi")
        .select("filename", "sequence_no")
        .distinct()
    )
    return (
        surviving.groupBy("filename")
        .agg(
            F.min("sequence_no").alias("min_seq"),
            F.max("sequence_no").alias("max_seq"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .where((F.col("min_seq") != 0) | (F.col("n_chunks") != F.col("max_seq") + 1))
    )


@query(
    "dead_nodes",
    oracle=oracle(
        """
SELECT o.host, o.port, h.last_ts
FROM offline_nodes o
LEFT JOIN (SELECT host, port, max(ts) AS last_ts FROM heartbeats GROUP BY 1,2) h
  ON o.host = h.host AND o.port = h.port
"""
    ),
)
def dead_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liveness timeout, batch analog (controller/HeartbeatMonitor.java:24-58):
    nodes whose latest heartbeat is older than MAX_HEARTBEAT_AGE."""
    off = offline_nodes_df(spark, sf_dir)
    hb = heartbeats_df(spark, sf_dir)
    last = hb.groupBy("host", "port").agg(F.max("ts").alias("last_ts"))
    return off.join(last, ["host", "port"], "left").select("host", "port", "last_ts")


@query(
    "event_dispatch",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def event_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-dispatch table as an aggregation (the oneof switch in
    controller/MessageProcessor.java:35-68 over proto/messages.proto:128-149)."""
    from ..tables import load_table

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# --- joins / set ops (§2.D) ----------------------------------------------


@query(
    "replicas_on_offline_nodes",
    oracle=oracle(
        """
SELECT r.filename, r.sequence_no, r.host, r.port
FROM replicas r
JOIN offline_nodes o ON r.host = o.host AND r.port = o.port
"""
    ),
)
def replicas_on_offline_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica-location membership scan during node-offline cleanup
    (controller/FileTable.java:59-75) — a broadcast left-semi join."""
    r = replicas_df(spark, sf_dir)
    off = offline_nodes_df(spark, sf_dir)
    return r.join(F.broadcast(off), ["host", "port"], "left_semi").select(
        "filename", "sequence_no", "host", "port"
    )


@query(
    "surviving_replicas",
    oracle=oracle(
        """
SELECT r.filename, r.sequence_no, r.host, r.port
FROM replicas r
WHERE NOT EXISTS (SELECT 1 FROM offline_nodes o
                  WHERE r.host = o.host AND r.port = o.port)
"""
    ),
)
def surviving_replicas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-offline cascade step 1 (controller/FileTable.java:59-97):
    drop every replica hosted on an offline node — broadcast anti join."""
    r = replicas_df(spark, sf_dir)
    off = offline_nodes_df(spark, sf_dir)
    return r.join(F.broadcast(off), ["host", "port"], "left_anti")


@query(
    "lost_chunks",
    oracle=oracle(
        """
SELECT c.filename, c.sequence_no FROM chunks c
WHERE NOT EXISTS (
  SELECT 1 FROM replicas r
  JOIN online_nodes o ON r.host = o.host AND r.port = o.port
  WHERE r.filename = c.filename AND r.sequence_no = c.sequence_no)
"""
    ),
)
def lost_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade step 2 (controller/FileTable.java:91-96 cleanup): chunks
    whose every replica is offline — anti join on the chunk key."""
    c = chunks_df(spark, sf_dir)
    r = replicas_df(spark, sf_dir)
    online = online_nodes_df(spark, sf_dir)
    alive = r.join(F.broadcast(online), ["host", "port"], "left_semi").select(
        "filename", "sequence_no"
    )
    return c.join(alive, ["filename", "sequence_no"], "left_anti").select(
        "filename", "sequence_no"
    )


@query(
    "replicas_after_corruption",
    oracle=oracle(
        """
WITH corrupt AS (
  SELECT c.filename, c.sequence_no
  FROM chunks c JOIN checksums_stored s
    ON c.filename = s.filename AND c.sequence_no = s.sequence_no
  WHERE c.checksum <> s.checksum
),
detecting AS (
  SELECT r.filename, r.sequence_no, min(printf('%s:%d', r.host, r.port)) AS addr
  FROM replicas r JOIN corrupt c
    ON r.filename = c.filename AND r.sequence_no = c.sequence_no
  GROUP BY r.filename, r.sequence_no
)
SELECT r.filename, r.sequence_no, r.host, r.port
FROM replicas r
WHERE NOT EXISTS (
  SELECT 1 FROM detecting d
  WHERE d.filename = r.filename AND d.sequence_no = r.sequence_no
    AND d.addr = printf('%s:%d', r.host, r.port))
"""
    ),
)
def replicas_after_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupted-replica removal (controller/FileTable.java:131-137,
    trigger controller/MessageProcessor.java:76-85): the detecting node
    (deterministically the min address holding a corrupt chunk) drops
    its replica — anti join on the composite (chunk, node) key."""
    r = replicas_df(spark, sf_dir)
    corrupt = (
        chunks_df(spark, sf_dir)
        .select("filename", "sequence_no", F.col("checksum").alias("computed"))
        .join(
            checksums_stored_df(spark, sf_dir).select(
                "filename", "sequence_no", F.col("checksum").alias("stored")
            ),
            ["filename", "sequence_no"],
        )
        .where(F.col("computed") != F.col("stored"))
        .select("filename", "sequence_no")
    )
    addr = F.format_string("%s:%d", F.col("host"), F.col("port"))
    detecting = (
        r.join(corrupt, ["filename", "sequence_no"], "left_semi")
        .groupBy("filename", "sequence_no")
        .agg(F.min(addr).alias("addr"))
    )
    return r.join(
        detecting,
        (r.filename == detecting.filename)
        & (r.sequence_no == detecting.sequence_no)
        & (addr == detecting.addr),
        "left_anti",
    )


@query(
    "under_replicated",
    oracle=oracle(
        f"""
SELECT c.filename, c.sequence_no,
       count(o.host) AS n_replicas,
       {MIN_REPLICAS} - count(o.host) AS n_missing
FROM chunks c
LEFT JOIN replicas r
  ON r.filename = c.filename AND r.sequence_no = c.sequence_no
LEFT JOIN online_nodes o ON r.host = o.host AND r.port = o.port
GROUP BY c.filename, c.sequence_no
HAVING count(o.host) < {MIN_REPLICAS}
"""
    ),
)
def under_replicated(
    spark: SparkSession, sf_dir: str, online: DataFrame | None = None
) -> DataFrame:
    """Under-replication filter (controller/FileTable.java:41-52,
    min-replicas=3 dfs.properties:10), counting only online replicas —
    the controller removes offline nodes' replicas before this check.
    `online` overrides the liveness source (the streaming control loop
    passes its own per-batch snapshot)."""
    c = chunks_df(spark, sf_dir)
    r = replicas_df(spark, sf_dir)
    if online is None:
        online = online_nodes_df(spark, sf_dir)
    live = r.join(F.broadcast(online), ["host", "port"], "left_semi")
    counts = live.groupBy("filename", "sequence_no").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        c.select("filename", "sequence_no")
        .join(counts, ["filename", "sequence_no"], "left")
        .select(
            "filename",
            "sequence_no",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_replicas"),
            (F.lit(MIN_REPLICAS) - F.coalesce(F.col("cnt"), F.lit(0))).alias(
                "n_missing"
            ),
        )
        .where(F.col("n_replicas") < MIN_REPLICAS)
    )


@query(
    "placement_candidates",
    oracle=oracle(
        f"""
WITH under AS (
  SELECT c.filename, c.sequence_no
  FROM chunks c
  LEFT JOIN replicas r
    ON r.filename = c.filename AND r.sequence_no = c.sequence_no
  LEFT JOIN online_nodes o ON r.host = o.host AND r.port = o.port
  GROUP BY c.filename, c.sequence_no
  HAVING count(o.host) < {MIN_REPLICAS}
)
SELECT u.filename, u.sequence_no, n.host, n.port
FROM under u CROSS JOIN online_nodes n
WHERE NOT EXISTS (
  SELECT 1 FROM replicas r
  WHERE r.filename = u.filename AND r.sequence_no = u.sequence_no
    AND r.host = n.host AND r.port = n.port)
"""
    ),
)
def placement_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate targets for a new replica = online nodes minus current
    holders (controller/ChunkReplicationRunnable.java:52-53 removeAll).

    Cross join with the broadcast node list then anti join away the
    holders — at production metadata scale the node list is always
    broadcastable, so only the chunk side shuffles."""
    under = under_replicated(spark, sf_dir).select("filename", "sequence_no")
    online = online_nodes_df(spark, sf_dir)
    r = replicas_df(spark, sf_dir)
    return (
        under.crossJoin(F.broadcast(online))
        .join(r, ["filename", "sequence_no", "host", "port"], "left_anti")
        .select("filename", "sequence_no", "host", "port")
    )


PLACEMENT_PICK_ORACLE = oracle(
    f"""
WITH under AS (
  SELECT c.filename, c.sequence_no, {MIN_REPLICAS} - count(o.host) AS n_missing
  FROM chunks c
  LEFT JOIN replicas r
    ON r.filename = c.filename AND r.sequence_no = c.sequence_no
  LEFT JOIN online_nodes o ON r.host = o.host AND r.port = o.port
  GROUP BY c.filename, c.sequence_no
  HAVING count(o.host) < {MIN_REPLICAS}
),
cand AS (
  SELECT u.filename, u.sequence_no, u.n_missing, n.host, n.port
  FROM under u CROSS JOIN online_nodes n
  WHERE NOT EXISTS (
    SELECT 1 FROM replicas r
    WHERE r.filename = u.filename AND r.sequence_no = u.sequence_no
      AND r.host = n.host AND r.port = n.port)
)
SELECT filename, sequence_no, host, port FROM (
  SELECT filename, sequence_no, host, port, n_missing,
         row_number() OVER (
           PARTITION BY filename, sequence_no
           ORDER BY md5(printf('seed42|%s|%d|%s|%d', filename, sequence_no, host, port))
         ) AS rk
  FROM cand)
WHERE rk <= n_missing
"""
)


@query("placement_pick", oracle=PLACEMENT_PICK_ORACLE)
def placement_pick(
    spark: SparkSession, sf_dir: str, online: DataFrame | None = None
) -> DataFrame:
    """Seeded random-N target selection (Utils.java:15-22
    chooseNrandomOrMin, used ChunkReplicationRunnable.java:60).

    The reference shuffles and takes N; we rank candidates by a seeded
    keyed hash (md5 of a seed|key string — identical ordering in the
    oracle) and keep the first n_missing per chunk. Determinism is the
    100 TB rule: re-running placement must not flap."""
    under = under_replicated(spark, sf_dir, online).select(
        "filename", "sequence_no", "n_missing"
    )
    if online is None:
        online = online_nodes_df(spark, sf_dir)
    r = replicas_df(spark, sf_dir)
    cand = (
        under.crossJoin(F.broadcast(online))
        .join(r, ["filename", "sequence_no", "host", "port"], "left_anti")
    )
    seed_key = F.md5(
        F.format_string(
            "seed42|%s|%d|%s|%d",
            F.col("filename"),
            F.col("sequence_no"),
            F.col("host"),
            F.col("port"),
        )
    )
    w = Window.partitionBy("filename", "sequence_no").orderBy(seed_key)
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.col("n_missing"))
        .select("filename", "sequence_no", "host", "port")
    )


RENDEZVOUS_ORACLE = oracle(
    f"""
SELECT filename, sequence_no, host, port,
       CAST(rk AS INTEGER) AS replica_rank
FROM (
  SELECT c.filename, c.sequence_no, n.host, n.port,
         row_number() OVER (
           PARTITION BY c.filename, c.sequence_no
           ORDER BY md5(printf('hrw|%s|%d|%s|%d',
                               c.filename, c.sequence_no, n.host, n.port)),
                    n.host, n.port
         ) AS rk
  FROM chunks c CROSS JOIN online_nodes n)
WHERE rk <= {MIN_REPLICAS}
"""
)


@query("rendezvous_placement", oracle=RENDEZVOUS_ORACLE)
def rendezvous_placement(
    spark: SparkSession, sf_dir: str, online: DataFrame | None = None
) -> DataFrame:
    """Rendezvous (highest-random-weight) placement: each chunk's
    MIN_REPLICAS targets are the online nodes with the largest keyed
    hash md5('hrw|chunk|node') — the industry-standard decentralized
    placement the reference's chooseNrandomOrMin (Utils.java:15-22)
    approximates with an unseeded shuffle. HRW's defining property
    (pinned by the churn pytest): when a node leaves, ONLY the chunks
    that ranked it re-place — every other assignment is bit-stable, so
    a node failure at 100 TB moves 1/N of the data instead of
    reshuffling the cluster.

    Scale: node list is broadcast (O(cluster) rows); per-chunk work is
    a bounded candidate ranking partitioned by chunk key; no
    coordinator state — any worker recomputes the same placement from
    the membership view alone."""
    c = chunks_df(spark, sf_dir).select("filename", "sequence_no")
    if online is None:
        online = online_nodes_df(spark, sf_dir)
    weight = F.md5(
        F.format_string(
            "hrw|%s|%d|%s|%d",
            F.col("filename"),
            F.col("sequence_no"),
            F.col("host"),
            F.col("port"),
        )
    )
    w = Window.partitionBy("filename", "sequence_no").orderBy(
        weight, F.col("host"), F.col("port")
    )
    return (
        c.crossJoin(F.broadcast(online.select("host", "port")))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= MIN_REPLICAS)
        .select(
            "filename",
            "sequence_no",
            "host",
            "port",
            F.col("rk").cast("int").alias("replica_rank"),
        )
    )


@query(
    "round_robin_assign",
    oracle=oracle(
        """
SELECT filename, sequence_no,
       printf('bass%02d', node_id) AS host,
       CAST(9000 + node_id AS INTEGER) AS port
FROM (
  SELECT filename, sequence_no,
         14 + idx + CASE WHEN idx >= 5 THEN 1 ELSE 0 END AS node_id
  FROM (SELECT filename, sequence_no, (fnum + sequence_no) % 10 AS idx FROM chunks))
"""
    ),
)
def round_robin_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upload round-robin placement (Client.java:342-354): chunk i goes
    to node (start + i) % n. Start is pinned to fnum (the reference
    uses a random start; we pin for oracle determinism)."""
    c = chunks_df(spark, sf_dir)
    idx = (F.col("fnum") + F.col("sequence_no")) % 10
    node_id = F.lit(14) + idx + F.when(idx >= 5, 1).otherwise(0)
    return c.select(
        "filename",
        "sequence_no",
        F.format_string("bass%02d", node_id).alias("host"),
        (F.lit(9000) + node_id).cast("int").alias("port"),
    )


@query(
    "failover_choice",
    oracle=oracle(
        """
SELECT filename, sequence_no, host, port FROM (
  SELECT r.filename, r.sequence_no, r.host, r.port,
         row_number() OVER (PARTITION BY r.filename, r.sequence_no
                            ORDER BY r.host, r.port) AS rk
  FROM replicas r
  JOIN online_nodes o ON r.host = o.host AND r.port = o.port)
WHERE rk = 1
"""
    ),
)
def failover_choice(
    spark: SparkSession, sf_dir: str, online: DataFrame | None = None
) -> DataFrame:
    """Download failover (Client.java:431-454): try replicas in
    preference order, take the first healthy one — rank-1 window over
    online replicas per chunk."""
    r = replicas_df(spark, sf_dir)
    if online is None:
        online = online_nodes_df(spark, sf_dir)
    alive = r.join(F.broadcast(online), ["host", "port"], "left_semi")
    w = Window.partitionBy("filename", "sequence_no").orderBy("host", "port")
    return (
        alive.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("filename", "sequence_no", "host", "port")
    )


@query(
    "inventory_delta",
    oracle=oracle(
        """
SELECT filename, sequence_no, host, port FROM replicas
EXCEPT ALL
SELECT filename, sequence_no, host, port FROM replicas
WHERE (sequence_no + port) % 7 <> 0
"""
    ),
)
def inventory_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat incremental diff (storageNode/HeartbeatRunnable.java:101-143
    getDiff): new snapshot minus last-ACKed snapshot via exceptAll.
    The old snapshot is modeled as a deterministic subset of replicas."""
    r = replicas_df(spark, sf_dir)
    old = r.where((F.col("sequence_no") + F.col("port")) % 7 != 0)
    return r.exceptAll(old)


@query(
    "publish_upsert",
    oracle=oracle(
        """
SELECT filename, sequence_no, host, port FROM replicas
UNION
SELECT filename, sequence_no,
       printf('bass%02d', node_id) AS host,
       CAST(9000 + node_id AS INTEGER) AS port
FROM (
  SELECT filename, sequence_no,
         14 + idx + CASE WHEN idx >= 5 THEN 1 ELSE 0 END AS node_id
  FROM (SELECT filename, sequence_no, (fnum + sequence_no) % 10 AS idx FROM chunks))
"""
    ),
)
def publish_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent publishChunk upsert (controller/FileTable.java:107-122,
    full-resync merge controller/MessageProcessor.java:303-344): union
    of the current table and an incoming report, set semantics via
    dropDuplicates."""
    r = replicas_df(spark, sf_dir)
    incoming = round_robin_assign(spark, sf_dir)
    return r.unionByName(incoming).dropDuplicates(
        ["filename", "sequence_no", "host", "port"]
    )


@query(
    "checksum_join",
    oracle=oracle(
        """
SELECT c.filename, c.sequence_no,
       c.checksum AS computed_checksum,
       s.checksum AS stored_checksum,
       (c.checksum <> s.checksum) AS is_corrupt
FROM chunks c JOIN checksums_stored s
  ON c.filename = s.filename AND c.sequence_no = s.sequence_no
"""
    ),
)
def checksum_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-vs-recomputed checksum equi-join (storageNode/
    MessageProcessor.java:162-164, StorageNode.java:88-91): every chunk
    with both digests and its corruption verdict."""
    c = chunks_df(spark, sf_dir).select(
        "filename", "sequence_no", F.col("checksum").alias("computed_checksum")
    )
    s = checksums_stored_df(spark, sf_dir).select(
        "filename", "sequence_no", F.col("checksum").alias("stored_checksum")
    )
    return c.join(s, ["filename", "sequence_no"]).withColumn(
        "is_corrupt", F.col("computed_checksum") != F.col("stored_checksum")
    )


@query(
    "corruption_scan",
    oracle=oracle(
        """
SELECT r.host, r.port, r.filename, r.sequence_no,
       s.checksum AS stored_checksum
FROM replicas r
JOIN chunks c ON c.filename = r.filename AND c.sequence_no = r.sequence_no
JOIN checksums_stored s
  ON s.filename = r.filename AND s.sequence_no = r.sequence_no
WHERE c.checksum <> s.checksum
"""
    ),
)
def corruption_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node corruption scan, batch analog (storageNode/
    ChunkCorruptionMonitor.java:32-93): every replica of a chunk whose
    stored digest mismatches, i.e. what each node's periodic re-hash
    pass would flag and report."""
    r = replicas_df(spark, sf_dir)
    bad = (
        chunks_df(spark, sf_dir)
        .select("filename", "sequence_no", F.col("checksum").alias("computed"))
        .join(
            checksums_stored_df(spark, sf_dir).select(
                "filename",
                "sequence_no",
                F.col("checksum").alias("stored_checksum"),
            ),
            ["filename", "sequence_no"],
        )
        .where(F.col("computed") != F.col("stored_checksum"))
        .select("filename", "sequence_no", "stored_checksum")
    )
    return r.join(bad, ["filename", "sequence_no"]).select(
        "host", "port", "filename", "sequence_no", "stored_checksum"
    )


REPLICATION_ORDERS_ORACLE = oracle(
    f"""
WITH under AS (
  SELECT c.filename, c.sequence_no, {MIN_REPLICAS} - count(o.host) AS n_missing
  FROM chunks c
  LEFT JOIN replicas r
    ON r.filename = c.filename AND r.sequence_no = c.sequence_no
  LEFT JOIN online_nodes o ON r.host = o.host AND r.port = o.port
  GROUP BY c.filename, c.sequence_no
  HAVING count(o.host) < {MIN_REPLICAS}
),
cand AS (
  SELECT u.filename, u.sequence_no, u.n_missing, n.host, n.port
  FROM under u CROSS JOIN online_nodes n
  WHERE NOT EXISTS (
    SELECT 1 FROM replicas r
    WHERE r.filename = u.filename AND r.sequence_no = u.sequence_no
      AND r.host = n.host AND r.port = n.port)
),
picks AS (
  SELECT filename, sequence_no, host, port FROM (
    SELECT filename, sequence_no, host, port, n_missing,
           row_number() OVER (
             PARTITION BY filename, sequence_no
             ORDER BY md5(printf('seed42|%s|%d|%s|%d',
                                 filename, sequence_no, host, port))
           ) AS rk
    FROM cand)
  WHERE rk <= n_missing
),
src AS (
  SELECT filename, sequence_no, host, port FROM (
    SELECT r.filename, r.sequence_no, r.host, r.port,
           row_number() OVER (PARTITION BY r.filename, r.sequence_no
                              ORDER BY r.host, r.port) AS rk
    FROM replicas r
    JOIN online_nodes o ON r.host = o.host AND r.port = o.port)
  WHERE rk = 1
)
SELECT p.filename, p.sequence_no,
       s.host AS from_host, s.port AS from_port,
       p.host AS to_host, p.port AS to_port
FROM picks p
JOIN src s ON s.filename = p.filename AND s.sequence_no = p.sequence_no
"""
)


@query("replication_orders", oracle=REPLICATION_ORDERS_ORACLE)
def replication_orders(
    spark: SparkSession, sf_dir: str, online: DataFrame | None = None
) -> DataFrame:
    """Re-replication control loop, batch analog (controller/
    ChunkReplicationRunnable.java:33-74): under-replicated chunks ×
    seeded placement picks, joined with a deterministic source replica
    (the first healthy holder). OrderSendChunk rows: who sends what to
    whom."""
    picks = placement_pick(spark, sf_dir, online)
    src = failover_choice(spark, sf_dir, online).select(
        "filename",
        "sequence_no",
        F.col("host").alias("from_host"),
        F.col("port").alias("from_port"),
    )
    return picks.join(src, ["filename", "sequence_no"]).select(
        "filename",
        "sequence_no",
        "from_host",
        "from_port",
        F.col("host").alias("to_host"),
        F.col("port").alias("to_port"),
    )


@query(
    "queue_order",
    oracle=oracle(
        """
SELECT host, port, hb_id,
       row_number() OVER (PARTITION BY host, port ORDER BY ts, hb_id) AS pos
FROM heartbeats
"""
    ),
)
def queue_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node FIFO delivery order (controller/MessageFifoQueue.java:11-45,
    MessageSender.java:24-49): arrival ranking within each node's queue."""
    hb = heartbeats_df(spark, sf_dir)
    w = Window.partitionBy("host", "port").orderBy("ts", "hb_id")
    return hb.select("host", "port", "hb_id", F.row_number().over(w).alias("pos"))


@query(
    "reassembly_order",
    oracle=oracle(
        """
SELECT sequence_no, size, checksum,
       CAST(coalesce(sum(size) OVER (PARTITION BY filename ORDER BY sequence_no
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                     0) AS BIGINT) AS byte_offset
FROM chunks WHERE filename = 'file0000.dat'
"""
    ),
)
def reassembly_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered reassembly projection (structures/Chunk.java:78-126
    createFileFromChunks): one file's chunks in sequence order with the
    running byte offset each chunk writes at — a cumulative-sum frame."""
    c = chunks_df(spark, sf_dir).where(F.col("filename") == "file0000.dat")
    # partitionBy(filename) so the cumulative sum generalizes to many files
    # without a single-partition global sort (here it also prunes to one file).
    w = (
        Window.partitionBy("filename")
        .orderBy("sequence_no")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return c.select(
        "sequence_no",
        "size",
        "checksum",
        F.coalesce(F.sum("size").over(w), F.lit(0)).alias("byte_offset"),
    )


# --- Compaction planning (the small-files problem) -----------------------

COMPACT_TARGET = 16 * 1024 * 1024  # output segment target: 16 MB

COMPACTION_PLAN_ORACLE = oracle(
    f"""
SELECT CAST((cum - size) // {COMPACT_TARGET} AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(size) AS BIGINT) AS total_bytes,
       CAST(count(DISTINCT filename) AS BIGINT) AS n_files,
       min(filename) AS first_file, max(filename) AS last_file
FROM (
  SELECT filename, sequence_no, size,
         sum(size) OVER (ORDER BY filename, sequence_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM chunks
)
GROUP BY 1
"""
)


@query("compaction_plan", oracle=COMPACTION_PLAN_ORACLE)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (small-files) planning: assign every chunk to a
    ~{COMPACT_TARGET}-byte output segment by walking the chunk stream
    in (filename, sequence_no) order and cutting a new bin whenever
    the running byte total crosses the target — the order-preserving
    greedy plan behind Delta/Iceberg OPTIMIZE and Spark's own
    file-coalescing reader (maxPartitionBytes binning), applied to the
    reference's 1 MB chunk inventory (Chunk.java:195-214 sizing). A
    bin's id is the target-multiple its FIRST byte falls in
    (sequence_pack's seq_id rule), so bins are contiguous, ordered,
    and at most one chunk over target — and the whole plan is exact
    integer arithmetic, hash-identical in DuckDB.

    Scale: the global running sum uses the pack_sequences two-phase
    shape — a per-file window (bounded: a file's chunk count) plus a
    carry-in over the O(#files) per-file totals — so no reducer sees
    the whole inventory; output is O(total_bytes / target) bins with
    the per-bin rollup (chunk/file counts, byte total, file range)
    a compactor needs to schedule one merge task per bin.
    """
    c = chunks_df(spark, sf_dir).select("filename", "sequence_no", "size")
    w_local = (
        Window.partitionBy("filename")
        .orderBy("sequence_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = c.withColumn("local_cum", F.sum("size").over(w_local))
    totals = c.groupBy("filename").agg(F.sum("size").alias("file_total"))
    w_off = Window.orderBy("filename").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "filename",
        F.coalesce(F.sum("file_total").over(w_off), F.lit(0)).alias("base"),
    )
    return (
        local.join(F.broadcast(offsets), "filename")
        .select(
            "filename",
            "size",
            (F.col("base") + F.col("local_cum")).alias("cum"),
        )
        .select(
            F.expr(f"(cum - size) div {COMPACT_TARGET}").alias("bin_id"),
            "filename",
            "size",
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("size").alias("total_bytes"),
            F.count_distinct("filename").alias("n_files"),
            F.min("filename").alias("first_file"),
            F.max("filename").alias("last_file"),
        )
    )
