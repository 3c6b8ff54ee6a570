"""Pins for operators/linalg.py beyond the DuckDB oracle: covariance
against numpy's reference implementation, and a planted-cluster KNN
eval where the majority vote provably recovers every label.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def test_covariance_matches_numpy(spark):
    """The fixed-point covariance must agree with numpy's float64
    population covariance to ~1e-5 (the quantization granularity),
    with nonnegative diagonals."""
    from cs686_big_data_p1_spark.operators.linalg import embedding_covariance
    from cs686_big_data_p1_spark.tables import load_table

    out = embedding_covariance(spark, SF_SMALL).toPandas()
    emb = np.array(
        load_table(spark, SF_SMALL, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    ref = np.cov(emb, rowvar=False, bias=True)  # population covariance
    d = emb.shape[1]
    assert len(out) == d * (d + 1) // 2
    for _, r in out.iterrows():
        i, j = int(r["dim_i"]) - 1, int(r["dim_j"]) - 1
        assert abs(r["cov"] - ref[i, j]) < 1e-5
    diag = out[out.dim_i == out.dim_j]
    assert (diag["cov"] >= 0).all()


def test_knn_eval_recovers_planted_clusters(spark, tmp_path):
    """Two tight clusters far apart: every query's neighbors share its
    label, so the majority vote must be unanimous and correct."""
    rng = np.random.default_rng(7)
    rows = []
    # labels 0/1 at centers +e0 and +e1; queries are vec_id 0..4
    for vid in range(40):
        label = vid % 2
        center = np.zeros(8)
        center[label] = 10.0
        v = center + rng.normal(0, 0.01, 8)
        rows.append((vid, [float(x) for x in v], label))
    import pyarrow as pa
    import pyarrow.parquet as papq

    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    papq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    from cs686_big_data_p1_spark.operators.linalg import knn_label_eval

    out = knn_label_eval(spark, str(tmp_path)).toPandas()
    assert len(out) == 5  # KNN_N_QUERIES
    assert (out["correct"] == 1).all()
    assert (out["n_votes"] == 5).all()  # unanimous at k=5
    assert (out["pred_label"] == out["true_label"]).all()


def test_pca_project_matches_all_driver_numpy(spark):
    """Distributed PCA (exact-covariance stats + driver eigh + Arrow
    projection) must match an all-driver numpy PCA of the same
    vectors: same top-K subspace, same signs, per-element agreement,
    and variance ordering along components."""
    import numpy as np

    from cs686_big_data_p1_spark.operators.linalg import PCA_K, pca_project
    from cs686_big_data_p1_spark.tables import load_table
    from tests.conftest import SF_SMALL

    rows = (
        load_table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [r.vec_id for r in rows]
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    # reference: the SAME fixed-point quantization the engine uses
    q12 = np.floor(
        X[:, :, None] * X[:, None, :] * 1e12
    ).sum(axis=0)
    q6 = np.floor(X * 1e6).sum(axis=0)
    n = len(X)
    C = (q12 / 1e12 - np.outer(q6 / 1e6, q6 / 1e6) / n) / n
    C = (C + C.T) / 2  # the engine mirrors the upper triangle
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(evals)[::-1][:PCA_K]
    W = evecs[:, order]
    for k in range(W.shape[1]):
        j = int(np.argmax(np.abs(W[:, k])))
        if W[j, k] < 0:
            W[:, k] = -W[:, k]
    mu = (q6 / 1e6) / n
    want = {i: p for i, p in zip(ids, (X - mu) @ W)}

    got = {r.vec_id: np.array(r.proj) for r in pca_project(spark, SF_SMALL).collect()}
    assert set(got) == set(want)
    for i in ids:
        assert np.allclose(got[i], want[i], atol=1e-9), i
    # variance must be non-increasing along the kept components
    P = np.array([got[i] for i in ids])
    v = P.var(axis=0)
    assert all(v[k] >= v[k + 1] - 1e-12 for k in range(len(v) - 1))


def _trunc_div(a, b):
    """int64 division truncating toward zero — Spark's `div` and
    DuckDB's `//` semantics (numpy's // floors, which differs on
    negatives)."""
    return np.sign(a) * (np.abs(a) // b)


def _numpy_power_replay(x, iters, scale):
    """Bit-exact numpy replay of gram_power_topvec's integer
    recurrence."""
    n, d = x.shape
    g = np.zeros((d, d), dtype=np.int64)
    for r in range(n):
        g += np.floor(np.outer(x[r], x[r]) * scale).astype(np.int64)
    g = _trunc_div(g, n)
    v = np.full(d, scale, dtype=np.int64)
    for _ in range(iters):
        w = g @ v
        dd = max(1, int(_trunc_div(np.int64(np.abs(w).max()), scale)))
        v = _trunc_div(w, dd)
    return g, v


def test_gram_power_topvec_replays_exactly_in_numpy(spark):
    """The operator is EXACT integer arithmetic end to end, so an
    independent numpy replay of the same recurrence (same quantized
    Gram, same truncating divisions) must reproduce every component
    bit for bit — the strongest possible cross-implementation check,
    and it holds on the REAL fixture regardless of its eigengap
    (convergence quality is tested separately on a planted-spike
    corpus below)."""
    from cs686_big_data_p1_spark.operators.linalg import (
        _PQ_SCALE,
        POWER_ITERS,
        gram_power_topvec,
    )

    out = gram_power_topvec(spark, SF_SMALL).toPandas().sort_values("dim")
    emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    _, v_np = _numpy_power_replay(x, POWER_ITERS, _PQ_SCALE)
    assert out["v_q"].to_numpy().astype(np.int64).tolist() == v_np.tolist()


def test_gram_power_topvec_converges_on_planted_spike(spark, tmp_path):
    """Eigen-convergence check on a corpus with a REAL dominant
    direction (the fixture's random embeddings are near-isotropic, so
    no power method converges there in few rounds — that is spectrum,
    not a bug): embeddings = spike +- small orthogonal noise, whose
    Gram has one dominant eigenvalue. After POWER_ITERS rounds the
    integer iterate must align with numpy eigh's top eigenvector of
    the same quantized matrix at |cos| > 0.99."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cs686_big_data_p1_spark.operators.linalg import (
        _PQ_SCALE,
        POWER_ITERS,
        gram_power_topvec,
    )

    rng = np.random.RandomState(7)
    d, n = 16, 40
    spike = np.zeros(d)
    spike[0], spike[1] = 0.8, 0.6
    rows = [
        (spike * (1.0 if i % 2 else -1.0) + rng.normal(0, 0.05, d)).astype(
            np.float32
        )
        for i in range(n)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    out = gram_power_topvec(spark, str(tmp_path)).toPandas()
    v = out.sort_values("dim")["v_q"].to_numpy().astype(np.float64)
    assert len(v) == d and np.abs(v).max() <= 1.2 * _PQ_SCALE

    x = np.stack([r.astype(np.float64) for r in rows])
    g, v_np = _numpy_power_replay(x, POWER_ITERS, _PQ_SCALE)
    assert v.astype(np.int64).tolist() == v_np.tolist()  # exact replay too
    _, evecs = np.linalg.eigh(g.astype(np.float64))
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99, cos
