"""Streaming vector-index maintenance: the Structured-Streaming half of
operators/ann.py's knn_ivf_append. New embeddings arrive as a stream
and are folded into the EXISTING frozen IVF index — per-row assignment
against a broadcast codebook, the canonical write path of a 100 TB
vector store (FAISS IndexIVF.add called from the ingest stream).

Assignment is embarrassingly map-side: each vector's nearest frozen
centroid depends only on (row, codebook), so the stream needs no
watermark and keeps no join state — the only stateful piece is the
per-vector argmax over its nlist candidate scores, bounded by the
micro-batch's own rows. The scoring kernel is the SAME fixed-point
pair_dot_pd fold the batch side uses, so stream and batch assignments
are bit-identical and the query is sweep-exact against the batch
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import norm as v_norm
from ..functions.vector import pair_dot_pd
from ..operators.ann import (
    ANN_N_QUERIES,
    DELTA_MOD,
    DELTA_RES,
    _append_parts,
)
from ..registry import query
from ..tables import SCHEMAS
from .liveness import (
    _run_to_memory,
    batch_fold_partitions,
    stream_clone,
)

def embeddings_arrivals(spark: SparkSession, sf_dir: str):
    """Streaming source for the embeddings table, dual-shape (the
    stream_decontaminate rule): the fixture ships a single FILE
    (streamed via pathGlobFilter over sf_dir — a streaming source's
    path must be a directory), but a multi-part DIRECTORY of the same
    name — the shape a real ingest lands — must stream identically
    (pytest pins the 3-part split for the consumers below)."""
    import os

    tbl = os.path.join(sf_dir, "embeddings.parquet")
    rs = spark.readStream.schema(SCHEMAS["embeddings"])
    if os.path.isdir(tbl):
        return rs.parquet(tbl)
    return rs.option("pathGlobFilter", "embeddings.parquet").parquet(sf_dir)


STREAM_IVF_ASSIGN_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, CAST(x AS DOUBLE) AS x, i
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
),
norms AS (
  SELECT vec_id,
         sqrt(CAST(sum(CAST(floor(x * x * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
             AS norm
  FROM ex GROUP BY vec_id
),
base AS (
  SELECT vec_id FROM embeddings
  WHERE vec_id >= {ANN_N_QUERIES} AND vec_id % {DELTA_MOD} <> {DELTA_RES}
),
nl AS (
  SELECT greatest(1, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))
      AS nlist
  FROM base
),
sp AS (SELECT nlist, ((nlist + 8) // 9) * 10 + 10 AS w FROM nl),
cents AS (
  SELECT vec_id AS cid FROM (
    SELECT b.vec_id, row_number() OVER (ORDER BY b.vec_id) AS rk, s.nlist
    FROM base b, sp s WHERE b.vec_id < {ANN_N_QUERIES} + s.w)
  WHERE rk <= nlist
),
cdots AS (
  SELECT v.vec_id, c.cid,
         CAST(sum(CAST(floor(v.x * ce.x * 1e12) AS BIGINT)) AS DOUBLE) / 1e12
             AS dot
  FROM ex v
  JOIN cents c ON true
  JOIN ex ce ON ce.vec_id = c.cid AND ce.i = v.i
  WHERE v.vec_id >= {ANN_N_QUERIES}
    AND v.vec_id % {DELTA_MOD} = {DELTA_RES}
  GROUP BY v.vec_id, c.cid
),
cscores AS (
  SELECT d.vec_id, d.cid, d.dot / (nv.norm * nc.norm) AS cscore
  FROM cdots d
  JOIN norms nv ON nv.vec_id = d.vec_id
  JOIN norms nc ON nc.vec_id = d.cid
)
SELECT vec_id AS new_vec, cid FROM (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cscore DESC, cid ASC) AS rk
  FROM cscores)
WHERE rk = 1
"""


@query("stream_ivf_assign", oracle=STREAM_IVF_ASSIGN_ORACLE)
def stream_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live IVF append: the delta residue class (the vectors that
    "arrive after the index was built") streams in and each is
    assigned to its nearest FROZEN centroid — knn_ivf_append's
    assignment pass as a stream-static join against the broadcast
    codebook, scored by the same fixed-point cosine fold, ties broken
    on ascending cid via max_by over (cscore, -cid).

    Scale: zero join state and no watermark — assignment is per-row
    against an O(nlist) broadcast closure; the only state is the
    per-new-vector argmax (one row per in-flight vector, emitted in
    complete mode for the drain; a production sink would write each
    micro-batch's assignments straight into the cid-partitioned store,
    write_ivf_store's layout, and feed ivf_imbalance for the retrain
    decision)."""
    spark = stream_clone(spark)
    # Frozen codebook: the batch-side index that already exists.
    _v, _b, _d, cents, _m, _p = _append_parts(spark, sf_dir)
    arrivals = (
        embeddings_arrivals(spark, sf_dir)
        .where(
            (F.col("vec_id") >= ANN_N_QUERIES)
            & ((F.col("vec_id") % DELTA_MOD) == DELTA_RES)
        )
        .select(
            "vec_id", "embedding", v_norm(F.col("embedding")).alias("norm")
        )
    )
    scored = arrivals.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        (
            pair_dot_pd(F.col("embedding"), F.col("cent_emb"))
            / (F.col("norm") * F.col("cent_norm"))
        ).alias("cscore"),
    )
    best = scored.groupBy("vec_id").agg(
        F.expr("max_by(cid, struct(cscore, -cid))").alias("cid")
    )
    out = _run_to_memory(best, "complete")
    return out.select(F.col("vec_id").alias("new_vec"), "cid")


def _drift_oracle() -> str:
    from ..operators.ann import EMBEDDING_DRIFT_ORACLE

    return EMBEDDING_DRIFT_ORACLE


@query("stream_embedding_drift", oracle=_drift_oracle())
def stream_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embedding_drift as a LIVE monitor: candidate embeddings stream
    in, each micro-batch folds its per-dimension fixed-point sums into
    the running per-split aggregate (one streaming groupBy on the dim
    key — d rows of state, bounded by embedding width forever), and
    the drained state yields the same exact cross-multiplied drift
    report the batch query computes: same oracle, sweep-exact.

    Scale: the streaming state is 2 x d bigint sums + counts — the
    mergeable sufficient statistic, so arrival order, batch sizing,
    and restarts cannot change the answer; the report joins no
    corpus-sized frame. In production this runs beside
    stream_ivf_assign on the same ingest: assignments flow to the
    store, drift flags page the retrain decision."""
    from ..operators.ann import _drift_flag_col

    spark = stream_clone(spark)
    arrivals = (
        embeddings_arrivals(spark, sf_dir)
        .where(F.col("vec_id") >= ANN_N_QUERIES)
    )
    is_delta = (F.col("vec_id") % DELTA_MOD) == DELTA_RES
    cells = arrivals.select(
        is_delta.alias("is_delta"),
        F.explode(
            F.expr(
                "transform(sequence(0, size(embedding)-1),"
                " i -> struct(i + 1 AS i,"
                "      CAST(floor(CAST(embedding[i] AS DOUBLE)"
                "           * 1000000.0) AS BIGINT) AS q))"
            )
        ).alias("m"),
    )
    sums = cells.groupBy(F.col("m.i").alias("dim")).agg(
        F.sum(F.when(~F.col("is_delta"), F.col("m.q"))).alias("base_sum_e6"),
        F.sum(F.when(F.col("is_delta"), F.col("m.q"))).alias("delta_sum_e6"),
        F.sum(F.when(~F.col("is_delta"), 1).otherwise(0))
        .cast("long")
        .alias("n_base"),
        F.sum(F.when(F.col("is_delta"), 1).otherwise(0))
        .cast("long")
        .alias("n_delta"),
    )
    out = _run_to_memory(sums, "complete")
    return out.select(
        "dim",
        "n_base",
        "n_delta",
        "base_sum_e6",
        "delta_sum_e6",
        (
            F.col("base_sum_e6").cast("double")
            / (F.col("n_base") * F.lit(1000000.0))
        ).alias("base_mean"),
        (
            F.col("delta_sum_e6").cast("double")
            / (F.col("n_delta") * F.lit(1000000.0))
        ).alias("delta_mean"),
        _drift_flag_col(),
    )


# --- stream_ivf_maintenance: the store's standing control-plane loop ------

# "Base store built" memo (the ann._STORE_READY pattern): path-valued,
# fingerprint-keyed, process-lifetime — see stream_ivf_maintenance.
_MAINT_BASE_READY: dict[tuple, str] = {}


def _maint_oracle() -> str:
    from ..operators.ann import (
        DRIFT_DEN,
        DRIFT_NUM,
        IMBALANCE_DEN,
        IMBALANCE_NUM,
        _NLIST_SQL,
    )

    return f"""
WITH ex AS (
  SELECT vec_id, CAST(x AS DOUBLE) AS x, i
  FROM (SELECT vec_id, unnest(embedding) AS x,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
),
norms AS (
  SELECT vec_id,
         sqrt(CAST(sum(CAST(floor(x * x * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
             AS norm
  FROM ex GROUP BY vec_id
),
base AS (
  SELECT vec_id FROM embeddings
  WHERE vec_id >= {ANN_N_QUERIES} AND vec_id % {DELTA_MOD} <> {DELTA_RES}
),
nl AS (
  SELECT greatest(1, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))
      AS nlist
  FROM base
),
sp AS (SELECT nlist, ((nlist + 8) // 9) * 10 + 10 AS w FROM nl),
cents AS (
  SELECT vec_id AS cid FROM (
    SELECT b.vec_id, row_number() OVER (ORDER BY b.vec_id) AS rk, s.nlist
    FROM base b, sp s WHERE b.vec_id < {ANN_N_QUERIES} + s.w)
  WHERE rk <= nlist
),
cdots AS (
  SELECT v.vec_id, c.cid,
         CAST(sum(CAST(floor(v.x * ce.x * 1e12) AS BIGINT)) AS DOUBLE) / 1e12
             AS dot
  FROM ex v
  JOIN cents c ON true
  JOIN ex ce ON ce.vec_id = c.cid AND ce.i = v.i
  GROUP BY v.vec_id, c.cid
),
cscores AS (
  SELECT d.vec_id, d.cid, d.dot / (nv.norm * nc.norm) AS cscore
  FROM cdots d
  JOIN norms nv ON nv.vec_id = d.vec_id
  JOIN norms nc ON nc.vec_id = d.cid
),
assigned AS (
  SELECT vec_id, cid,
         (vec_id % {DELTA_MOD} = {DELTA_RES}) AS is_delta
  FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cscore DESC, cid ASC) AS rk
    FROM cscores WHERE vec_id >= {ANN_N_QUERIES})
  WHERE rk = 1
),
occ AS (
  SELECT c.cid,
         CAST(count(a.vec_id) AS BIGINT) AS occupancy,
         CAST(coalesce(sum(CASE WHEN a.is_delta THEN 1 END), 0) AS BIGINT)
             AS n_delta
  FROM cents c LEFT JOIN assigned a ON a.cid = c.cid
  GROUP BY c.cid
),
tot AS (
  SELECT CAST(sum(occupancy) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM occ
),
dcells AS (
  SELECT (vec_id % {DELTA_MOD} = {DELTA_RES}) AS is_delta, i,
         CAST(floor(x * 1000000.0) AS BIGINT) AS q
  FROM ex WHERE vec_id >= {ANN_N_QUERIES}
),
dsums AS (
  SELECT i,
         CAST(sum(CASE WHEN NOT is_delta THEN q END) AS BIGINT) AS sxb,
         CAST(sum(CASE WHEN is_delta THEN q END) AS BIGINT) AS sxd,
         CAST(sum(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS nd
  FROM dcells GROUP BY i
),
dd AS (
  SELECT CAST(coalesce(sum(
      CASE WHEN abs(CAST(sxd AS HUGEINT) * nb - CAST(sxb AS HUGEINT) * nd)
                    * {DRIFT_DEN}
                > CAST(nb AS HUGEINT) * nd * 1000000 * {DRIFT_NUM}
           THEN 1 END), 0) AS BIGINT) AS drift_dims
  FROM dsums
)
SELECT o.cid, o.occupancy, o.n_delta,
       (o.occupancy * t.n_cells * {IMBALANCE_DEN}
        > t.n_total * {IMBALANCE_NUM}) AS hot,
       d.drift_dims,
       ((o.occupancy * t.n_cells * {IMBALANCE_DEN}
         > t.n_total * {IMBALANCE_NUM}) OR d.drift_dims > 0) AS retrain
FROM occ o CROSS JOIN tot t CROSS JOIN dd d
"""


def fold_ivf_batch(batch: DataFrame, store_path: str, cent_rows) -> None:
    """Fold ONE micro-batch of arriving embeddings into the physical
    cid-partitioned store: assign against the frozen codebook
    (reconstructed from the driver-collected cent_rows — bounded
    O(nlist x d), so the closure never captures a foreign-session
    DataFrame), anti-join the store's existing vec_ids (materialized
    before the write — the append_ivf_store retry contract), and
    dynamic-partition-append only the fresh rows. At-least-once
    delivery + this idempotent fold = exactly-once store contents: a
    replayed batch's rows are all "existing" and append nothing."""
    from ..operators.ann import _assign_frozen

    if batch.isEmpty():
        return
    spark_b = batch.sparkSession
    cents = F.broadcast(
        spark_b.createDataFrame(
            cent_rows,
            "cid bigint, cent_emb array<float>, cent_norm double",
        )
    )
    b = batch.select(
        "vec_id", "embedding", v_norm(F.col("embedding")).alias("norm")
    )
    assigned = (
        _assign_frozen(b, cents)
        .where(F.col("rk") == 1)
        .select(F.col("vec_id").alias("dv"), "cid")
        .localCheckpoint(eager=True)
    )
    # The frozen codebook makes a replayed row land in the SAME cid,
    # so the exactly-once guard only needs the batch's target cells:
    # partition-prune the existing-id read to those cids (ADVICE r13 —
    # per-fold cost is O(batch cells), not O(store)). The cid list is
    # a bounded driver collect (<= nlist rows).
    batch_cids = [r.cid for r in assigned.select("cid").distinct().collect()]
    existing = (
        spark_b.read.parquet(store_path)
        .where(F.col("cid").isin(batch_cids))
        .select(F.col("vec_id").alias("dv"))
        .localCheckpoint(eager=True)
    )
    fresh = assigned.join(existing, "dv", "left_anti")
    (
        batch.join(fresh, batch.vec_id == F.col("dv"))
        .select("vec_id", "embedding", "cid")
        .write.mode("append")
        .partitionBy("cid")
        .parquet(store_path)
    )


@query("stream_ivf_maintenance", oracle=_maint_oracle())
def stream_ivf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding store's standing control-plane loop (VERDICT r12
    #8, mirroring T4's re-replication loop): arriving embeddings
    stream in and each micro-batch is FOLDED into the physical
    cid-partitioned store via foreachBatch (assign against the frozen
    codebook, idempotent anti-join append — the cdc_apply_stream
    pattern), then the drained store yields the retrain decision both
    batch monitors compute: per-cell occupancy with the exact integer
    `hot` flag (ivf_imbalance), the corpus-wide count of drifting
    dimensions (embedding_drift's 128-bit flag), and `retrain` = any
    trigger fired. Every reported number is recomputed relationally by
    the oracle from the embeddings table alone, so a hash match proves
    the STREAMED folds landed exactly once — batch sizing, replays,
    and arrival order cannot change the report.

    Scale: each fold touches only its batch's target cells (dynamic
    partition append over the bounded O(nlist x d) broadcast
    codebook); the post-drain report is one groupBy(cid) over store
    metadata columns + d rows of drift sufficient statistics. In
    production this job runs forever beside stream_ivf_assign; the
    report rows with retrain = true page the rebuild
    (write_ivf_store)."""
    import hashlib as _hl
    import os
    import tempfile

    from ..operators.ann import (
        DRIFT_DEN,
        DRIFT_NUM,
        IMBALANCE_DEN,
        IMBALANCE_NUM,
        _append_parts,
        write_ivf_base_store,
    )
    from ..tables import table_fingerprint

    # heavy-fold drain: batch-plan width, not state width (liveness.py)
    spark = stream_clone(spark, batch_fold_partitions(spark))
    # Yesterday's index: base-only store + frozen codebook. The base
    # write is memoized per (application, sf_dir, fingerprint) — on a
    # re-invocation the stream's folds anti-join into the already-
    # folded store as no-ops (the exactly-once property doubles as the
    # warm path) and the report is byte-identical.
    fp = table_fingerprint(sf_dir, "embeddings")
    digest = _hl.md5(repr((sf_dir, fp)).encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(),
        f"ivf_maint_{spark.sparkContext.applicationId}_{digest}",
    )
    key = (spark.sparkContext.applicationId, sf_dir, fp)
    if _MAINT_BASE_READY.get(key) != path or not os.path.isdir(path):
        write_ivf_base_store(spark, sf_dir, path)
        # scratch store: reaped at interpreter exit (ann._ivf_store_ready
        # convention) so sweep/bench processes never litter the temp root
        import atexit
        import shutil

        atexit.register(shutil.rmtree, path, True)
        _MAINT_BASE_READY.clear()
        _MAINT_BASE_READY[key] = path
    _v, _b, _d, cents, _m, _p = _append_parts(spark, sf_dir)
    cent_rows = [
        (int(r.cid), [float(x) for x in r.cent_emb], float(r.cent_norm))
        for r in cents.collect()
    ]  # bounded: nlist rows — the broadcast codebook, driver-pinned

    arrivals = (
        embeddings_arrivals(spark, sf_dir)
        .where(
            (F.col("vec_id") >= ANN_N_QUERIES)
            & ((F.col("vec_id") % DELTA_MOD) == DELTA_RES)
        )
    )
    q = (
        arrivals.writeStream.foreachBatch(
            lambda b, _i: fold_ivf_batch(b, path, cent_rows)
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # Drained control-plane report, measured off the PHYSICAL store.
    store = spark.read.parquet(path)
    is_delta = (F.col("vec_id") % DELTA_MOD) == DELTA_RES
    occ = (
        cents.select("cid")
        .join(
            store.select(
                "cid", "vec_id", is_delta.cast("int").alias("d")
            ),
            "cid",
            "left",
        )
        .groupBy("cid")
        .agg(
            F.count("vec_id").alias("occupancy"),
            F.coalesce(F.sum("d"), F.lit(0)).cast("long").alias("n_delta"),
        )
    )
    tot = occ.agg(
        F.sum("occupancy").alias("n_total"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    dcells = store.select(
        is_delta.alias("is_delta"),
        F.explode(
            F.expr(
                "transform(sequence(0, size(embedding)-1),"
                " i -> struct(i + 1 AS i,"
                "      CAST(floor(CAST(embedding[i] AS DOUBLE)"
                "           * 1000000.0) AS BIGINT) AS q))"
            )
        ).alias("m"),
    )
    dsums = dcells.groupBy(F.col("m.i").alias("dim")).agg(
        F.sum(F.when(~F.col("is_delta"), F.col("m.q"))).alias("base_sum_e6"),
        F.sum(F.when(F.col("is_delta"), F.col("m.q"))).alias("delta_sum_e6"),
        F.sum(F.when(~F.col("is_delta"), 1).otherwise(0))
        .cast("long")
        .alias("n_base"),
        F.sum(F.when(F.col("is_delta"), 1).otherwise(0))
        .cast("long")
        .alias("n_delta"),
    )
    from ..operators.ann import _drift_flag_col

    dd = dsums.select(_drift_flag_col()).agg(
        F.coalesce(
            F.sum(F.when(F.col("drift"), 1)), F.lit(0)
        )
        .cast("long")
        .alias("drift_dims")
    )
    hot = (
        F.col("occupancy") * F.col("n_cells") * F.lit(IMBALANCE_DEN)
        > F.col("n_total") * F.lit(IMBALANCE_NUM)
    )
    return (
        occ.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dd))
        .select(
            "cid",
            "occupancy",
            "n_delta",
            hot.alias("hot"),
            "drift_dims",
            (hot | (F.col("drift_dims") > 0)).alias("retrain"),
        )
    )


# --- stream_decontaminate_semantic: the paraphrase class goes live --------
#
# stream_decontaminate closes the verbatim-overlap class at ingest;
# this closes the PARAPHRASE class the same way (VERDICT r13 #6):
# arriving train-split embeddings are cell-assigned against the
# broadcast SemDeDup codebook and scored — fixed-point cosine — only
# against the STATIC eval-split vectors of the same cell, the
# decontaminate_semantic co-bucketing applied as a stream-static join.
# The eval side is a published table in production (rebuilt only when
# the eval suite changes); here it is derived once per fixture and
# persisted cid-partitioned so each micro-batch's join read prunes to
# the batch's cells. Hit pairs FOLD into a cid-partitioned accumulator
# with the anti-join idempotence contract (fold_ivf_batch's), so
# at-least-once delivery still yields the exactly-once hit set and the
# drained report equals batch decontaminate_semantic's — same oracle,
# sweep-exact.

def fold_sem_decon_batch(
    batch: DataFrame,
    eval_path: str,
    hits_path: str,
    cent_rows,
    train_bound: str,
) -> None:
    """Fold ONE micro-batch of arriving embeddings into the
    contamination-hit store: in-row train-split tag (embeddings ⊆
    documents on every fixture — FIXTURES.md — so the tag equals the
    batch query's documents join), cell assignment against the
    driver-pinned codebook rows, cosine vs the persisted eval side of
    the batch's cells only, anti-join against already-recorded pairs
    (pruned to the same cells), append only the fresh hits."""
    from pyspark.sql.window import Window

    from ..operators.ann import DECON_SEM_TAU

    if batch.isEmpty():
        return
    sb = batch.sparkSession
    b_tag = F.substring(
        F.md5(F.format_string("split|%d", F.col("vec_id"))), 1, 2
    )
    tr = batch.where(b_tag < train_bound).select(
        "vec_id", "embedding", v_norm(F.col("embedding")).alias("norm")
    )
    cents = F.broadcast(
        sb.createDataFrame(
            cent_rows,
            "cid bigint, cent_emb array<float>, cent_norm double",
        )
    )
    cscore = (
        pair_dot_pd(F.col("embedding"), F.col("cent_emb"))
        / (F.col("norm") * F.col("cent_norm"))
    ).alias("cscore")
    scores = tr.crossJoin(cents).select(
        "vec_id", "embedding", "norm", "cid", cscore
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cscore"), F.asc("cid")
    )
    assigned = (
        scores.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("vec_id").alias("train_doc"),
            F.col("embedding").alias("a_emb"),
            F.col("norm").alias("a_norm"),
            "cid",
        )
        .localCheckpoint(eager=True)
    )
    # Bounded control flow: <= ncells distinct cells per batch.
    cids = [r.cid for r in assigned.select("cid").distinct().collect()]
    ev = sb.read.parquet(eval_path).where(F.col("cid").isin(cids))
    hits = (
        assigned.join(ev, "cid")
        .select(
            "train_doc",
            "eval_doc",
            "cid",
            (
                pair_dot_pd(F.col("a_emb"), F.col("b_emb"))
                / (F.col("a_norm") * F.col("b_norm"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= DECON_SEM_TAU)
    )
    try:
        existing = (
            sb.read.parquet(hits_path)
            .where(F.col("cid").isin(cids))
            .select("train_doc", "eval_doc")
            .localCheckpoint(eager=True)
        )
        fresh = hits.join(
            existing, ["train_doc", "eval_doc"], "left_anti"
        )
    except Exception:  # first fold: no hit store yet
        fresh = hits
    (
        fresh.select("train_doc", "eval_doc", "cosine", "cid")
        .write.mode("append")
        .partitionBy("cid")
        .parquet(hits_path)
    )


def _sem_decon_oracle() -> str:
    from ..operators.ann import DECONTAMINATE_SEMANTIC_ORACLE

    return DECONTAMINATE_SEMANTIC_ORACLE


_SEM_DECON_READY: dict[tuple, tuple] = {}


@query("stream_decontaminate_semantic", oracle=_sem_decon_oracle())
def stream_decontaminate_semantic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Live semantic (paraphrase-class) eval decontamination — see the
    section comment. The drained per-train-doc report (hit count,
    closest eval doc, top cosine) is aggregated off the PHYSICAL hit
    store, and the batch oracle replays it relationally, so a hash
    match proves the streamed folds recorded exactly the co-bucketed
    tau-hits — batch sizing, replays, and arrival order cannot change
    the verdict (batch parity additionally pinned by pytest vs
    decontaminate_semantic).

    Scale: per batch — one broadcast-codebook assignment
    (O(batch x ncells)), one cid-pruned join against the ~5 %-of-corpus
    eval side, one cid-pruned anti-join for idempotence; no unbounded
    stream state (a doc's verdict is final once its own cell is
    scored). The report is one groupBy over int-pair hit rows."""
    import atexit
    import hashlib as _hl
    import os
    import shutil
    import tempfile

    from ..operators.ann import (
        _corpus_n,
        _nlist,
        sem_assignment,
    )
    from ..operators.splits import SPLIT_BOUNDS
    from ..tables import load_table, table_fingerprint

    fp = table_fingerprint(sf_dir, "embeddings")
    app = spark.sparkContext.applicationId
    digest = _hl.md5(repr((sf_dir, fp, "semdecon")).encode()).hexdigest()[
        :12
    ]
    eval_path = os.path.join(
        tempfile.gettempdir(), f"sem_decon_eval_{app}_{digest}"
    )
    hits_path = os.path.join(
        tempfile.gettempdir(), f"sem_decon_hits_{app}_{digest}"
    )
    key = (app, sf_dir, fp)
    if _SEM_DECON_READY.get(key) != (
        eval_path,
        hits_path,
    ) or not os.path.isdir(eval_path):
        # Static eval side, derived ONCE per fixture on the caller's
        # session (shares the sem_assignment memo with the batch
        # queries) and persisted cid-partitioned. Scratch dirs reaped
        # at interpreter exit (the _ivf_store_ready convention).
        e = load_table(spark, sf_dir, "embeddings")
        d = load_table(spark, sf_dir, "documents")
        vecs = e.select(
            "vec_id", "embedding", v_norm(F.col("embedding")).alias("norm")
        )
        assigned = sem_assignment(spark, sf_dir).select("vec_id", "cid")
        btag = F.substring(
            F.md5(F.format_string("split|%d", F.col("doc_id"))), 1, 2
        )
        tags = d.select("doc_id", btag.alias("b"))
        ev = (
            assigned.join(tags, assigned.vec_id == tags.doc_id)
            .where(F.col("b") >= SPLIT_BOUNDS[1])
            .join(vecs, "vec_id")
            .select(
                F.col("vec_id").alias("eval_doc"),
                "cid",
                F.col("embedding").alias("b_emb"),
                F.col("norm").alias("b_norm"),
            )
        )
        (
            ev.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("cid")
            .parquet(eval_path)
        )
        shutil.rmtree(hits_path, True)  # stale hits of a prior build
        atexit.register(shutil.rmtree, eval_path, True)
        atexit.register(shutil.rmtree, hits_path, True)
        _SEM_DECON_READY[key] = (eval_path, hits_path)
    # Driver-pinned SemDeDup codebook rows: ncells = ceil(sqrt(n)),
    # bounded O(ncells x d) — the fold_ivf_batch closure convention.
    e = load_table(spark, sf_dir, "embeddings")
    ncells = _nlist(_corpus_n(spark, sf_dir))
    cent_rows = [
        (int(r.vec_id), [float(x) for x in r.embedding], float(r.norm))
        for r in e.select(
            "vec_id", "embedding", v_norm(F.col("embedding")).alias("norm")
        )
        .where(
            (F.col("vec_id") >= ANN_N_QUERIES)
            & (F.col("vec_id") < ANN_N_QUERIES + ncells)
        )
        .collect()
    ]
    # heavy-fold drain: batch-plan width, not state width (liveness.py)
    spark = stream_clone(spark, batch_fold_partitions(spark))
    arrivals = (
        embeddings_arrivals(spark, sf_dir)
    )
    bound = SPLIT_BOUNDS[0]
    q = (
        arrivals.writeStream.foreachBatch(
            lambda b, _i: fold_sem_decon_batch(
                b, eval_path, hits_path, cent_rows, bound
            )
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        hitsdf = spark.read.parquet(hits_path)
    except Exception:  # clean corpus: no hits recorded at all
        return spark.createDataFrame(
            [],
            "doc_id bigint, n_eval_hits bigint, "
            "top_eval_doc bigint, top_cosine double",
        )
    return hitsdf.groupBy(F.col("train_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_eval_hits"),
        F.expr("max_by(eval_doc, struct(cosine, -eval_doc))")
        .cast("bigint")
        .alias("top_eval_doc"),
        F.max("cosine").alias("top_cosine"),
    )


# --- stream_knn_store: store-served search goes live (VERDICT r14 #8) -----
#
# knn_ivf_store_live proved the SERVING invariant in batch: top-k off
# the physical cid-partitioned store, tombstones honored, so a
# curation-dropped vector can never be returned. This is the same
# serving path as a standing stream: queries ARRIVE (the
# embeddings_arrivals dual-shape source), each micro-batch computes
# its probes against the broadcast frozen codebook (zero join state —
# the stream_ivf_assign idiom), reads ONLY the probed cells through
# probe_ivf_store_live (partition-pruned, tombstone anti-join), scores
# with the engine's fixed-point cosine fold, and appends its top-k to
# a results relation under the fold_ivf_batch idempotence contract
# (a replayed batch's queries are already served and write nothing).
# Stream and batch share every kernel, so the drained results equal
# knn_ivf_store_live's bit for bit — same oracle, sweep-exact, plus a
# stream==batch parity pytest.

def serve_knn_batch(
    batch: DataFrame, store_path: str, cent_rows, results_path: str
) -> None:
    """Serve ONE micro-batch of arriving queries against the live
    store. Per batch: O(nlist) broadcast probe assignment, one
    partition-pruned live read of the batch's probed cells (tombstones
    anti-joined inside probe_ivf_store_live), exact top-k over those
    cells' rows, one idempotent append. The already-served guard read
    is the results relation's query_id column only (top-k rows per
    served query — bounded)."""
    from ..operators.ann import (
        ANN_K,
        IVF_NPROBE,
        _assign_frozen,
        _tombstones_present,
        probe_ivf_store_live,
    )
    from ..functions.vector import pair_dot_pd
    from pyspark.sql.window import Window

    if batch.isEmpty():
        return
    spark_b = batch.sparkSession
    cents = F.broadcast(
        spark_b.createDataFrame(
            cent_rows,
            "cid bigint, cent_emb array<float>, cent_norm double",
        )
    )
    qb = batch.select(
        "vec_id", "embedding", v_norm(F.col("embedding")).alias("norm")
    )
    # Exactly-once results under at-least-once delivery: a query that
    # already has rows in the results relation is dropped before any
    # store IO. (_tombstones_present is the generic "parquet data
    # under this dir" probe — a missing dir is the first-batch state,
    # any other read failure must raise.)
    if _tombstones_present(results_path):
        served = (
            spark_b.read.parquet(results_path)
            .select(F.col("query_id").alias("vec_id"))
            .distinct()
        )
        qb = qb.join(served, "vec_id", "left_anti")
    qb = qb.localCheckpoint(eager=True)
    if qb.isEmpty():
        return
    probes = (
        _assign_frozen(qb, cents)
        .where(F.col("rk") <= IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cid")
        .localCheckpoint(eager=True)
    )
    # Bounded control flow: <= batch_queries x nprobe cells, <= nlist.
    cids = sorted({r.cid for r in probes.select("cid").distinct().collect()})
    live = probe_ivf_store_live(spark_b, store_path, cids).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        v_norm(F.col("embedding")).alias("c_norm"),
        "cid",
    )
    qv = qb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        F.broadcast(probes).join(live, "cid")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                pair_dot_pd(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_K)
        .write.mode("append")
        .parquet(results_path)
    )


def _knn_serve_oracle() -> str:
    from ..operators.ann import KNN_IVF_STORE_LIVE_ORACLE

    return KNN_IVF_STORE_LIVE_ORACLE


@query("stream_knn_store", oracle=_knn_serve_oracle())
def stream_knn_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live store-served ANN search: arriving queries stream in and
    each micro-batch is served off the PHYSICAL cid-partitioned store
    with the curation drop set's tombstones honored — the serving path
    of knn_ivf_store_live as a standing stream. The drop set is folded
    first (idempotent, the same set ivf_store_delete folds); each
    batch then pays one broadcast probe assignment, one
    partition-pruned live-cell read, and one bounded top-k. The oracle
    is knn_ivf_store_live's — DuckDB replays assignment, probes, the
    drop exclusion, and exact fixed-point ranking relationally, so a
    hash match proves the STREAMED serving path can never return a
    curation-dropped vector, regardless of batch sizing or replays.

    Scale: zero stream state (no watermark, no join state — per-batch
    closures are the O(nlist x d) codebook and the batch's own rows);
    store IO is partition-pruned to probed cells; results append under
    the anti-join idempotence contract. In production this job is the
    online serving tier over the store stream_ivf_maintenance keeps
    fresh."""
    import atexit
    import hashlib as _hl
    import os
    import shutil
    import tempfile

    from ..operators.ann import (
        ANN_N_QUERIES,
        _append_parts,
        _assign_frozen,
        _ivf_store_ready,
        decontaminate_semantic,
        delete_ivf_store,
    )
    from ..tables import load_table, table_fingerprint

    # heavy-fold drain: batch-plan width, not state width (liveness.py)
    spark = stream_clone(spark, batch_fold_partitions(spark))
    path = _ivf_store_ready(spark, sf_dir)
    _v, _b, _d, cents, _m, _p = _append_parts(spark, sf_dir)
    # Fold the curation drop set as tombstones (idempotent — the
    # ivf_store_delete fold; on a shared store deletes stay mask-only).
    e = load_table(spark, sf_dir, "embeddings")
    dropped = decontaminate_semantic(spark, sf_dir).select("doc_id")
    drop_vecs = e.join(dropped, e.vec_id == dropped.doc_id).select(
        "vec_id", "embedding", v_norm(F.col("embedding")).alias("norm")
    )
    drops = (
        _assign_frozen(drop_vecs, cents)
        .where(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    delete_ivf_store(spark, path, drops)
    cent_rows = [
        (int(r.cid), [float(x) for x in r.cent_emb], float(r.cent_norm))
        for r in cents.collect()
    ]  # bounded: nlist rows — the broadcast codebook, driver-pinned

    fp = table_fingerprint(sf_dir, "embeddings")
    digest = _hl.md5(repr((sf_dir, fp, "serve")).encode()).hexdigest()[:12]
    results_path = os.path.join(
        tempfile.gettempdir(),
        f"knn_serve_{spark.sparkContext.applicationId}_{digest}",
    )
    atexit.register(shutil.rmtree, results_path, True)

    arrivals = embeddings_arrivals(spark, sf_dir).where(
        F.col("vec_id") < ANN_N_QUERIES
    )
    q = (
        arrivals.writeStream.foreachBatch(
            lambda b, _i: serve_knn_batch(b, path, cent_rows, results_path)
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(results_path).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )
