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
from .liveness import _run_to_memory, stream_clone

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
        spark.readStream.schema(SCHEMAS["embeddings"])
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
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
        spark.readStream.schema(SCHEMAS["embeddings"])
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
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
