"""End-to-end curation DAG: the operators compose into the actual
training-data pipeline — quality/repetition filter → exact-dup removal
→ near-dup cluster representatives → split → token-budget packing —
as ONE lazy DataFrame job (no materialization between stages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_curation_dag_composes(spark, registry):
    q = registry.QUERIES
    kept = q["corpus_filter"](spark, SF_SMALL).where("keep").select("doc_id")
    keepers = (
        q["dedup_exact"](spark, SF_SMALL)
        .select(F.col("keeper_doc_id").alias("doc_id"))
    )
    # near-dup clusters: drop everything but each cluster's representative
    clusters = q["dedup_clusters"](spark, SF_SMALL)
    non_reps = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    surviving = (
        kept.join(keepers, "doc_id", "left_semi")
        .join(non_reps, "doc_id", "left_anti")
    )
    train = (
        q["dataset_split"](spark, SF_SMALL)
        .where(F.col("split") == "train")
        .select("doc_id")
    )
    packed = q["sequence_pack"](spark, SF_SMALL)
    final = (
        packed.join(surviving, "doc_id", "left_semi")
        .join(train, "doc_id", "left_semi")
    )

    rows = final.collect()
    assert rows, "pipeline filtered everything out"
    final_ids = {r.doc_id for r in rows}

    # every surviving doc passed every gate
    kept_ids = {r.doc_id for r in kept.collect()}
    keeper_ids = {r.doc_id for r in keepers.collect()}
    dropped_nd = {r.doc_id for r in non_reps.collect()}
    train_ids = {r.doc_id for r in train.collect()}
    assert final_ids <= kept_ids & keeper_ids & train_ids
    assert not (final_ids & dropped_nd)
    # and the pipeline actually removed something at each stage
    all_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    # (the sf0.001 fixture is clean unique text, so the quality and
    # exact-dup gates may keep everything — near-dup clustering and the
    # split must still remove docs, and so must the composition)
    assert len(kept_ids) <= len(all_ids)
    assert len(keeper_ids) <= len(all_ids)
    assert dropped_nd, "near-dup clustering removed nothing"
    assert len(train_ids) < len(all_ids)
    assert len(final_ids) < len(all_ids)

    # packing stayed intact through the joins: seq ids are within each
    # language's budgeted range and tokens are positive
    assert all(r.n_tokens > 0 and r.seq_id >= 0 for r in rows)
