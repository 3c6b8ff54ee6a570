

def test_cluster_keep_best_keeps_the_max_quality_member(spark, registry):
    """cluster_keep_best must pick, per near-dup component, the member
    with the highest quality_score (ties on ascending doc_id) — pin by
    recomputing the argmax in python from the two source queries, and
    that sizes/drop counts add up."""
    sf = "/root/testdata/sf0.001"
    clusters = {
        r.doc_id: r.cluster_id
        for r in registry.QUERIES["dedup_clusters"](spark, sf).collect()
    }
    registry.clear_caches()
    quality = {
        r.doc_id: r.quality
        for r in registry.QUERIES["quality_score"](spark, sf).collect()
    }
    registry.clear_caches()
    rows = registry.QUERIES["cluster_keep_best"](spark, sf).collect()
    registry.clear_caches()

    by_cluster = {}
    for doc, cid in clusters.items():
        by_cluster.setdefault(cid, []).append(doc)
    assert {r.cluster_id for r in rows} == set(by_cluster)
    for r in rows:
        members = by_cluster[r.cluster_id]
        assert r.n_members == len(members)
        assert r.n_dropped == len(members) - 1
        best = max(members, key=lambda d: (quality[d], -d))
        assert r.kept_doc == best, r.cluster_id
        assert r.kept_quality == quality[best]


def test_cluster_labels_memo_is_shared_and_fingerprint_keyed(
    spark, tmp_path, registry
):
    """The cluster-labels memo must (a) serve the SAME checkpointed
    frame to repeat callers within a process — dedup_clusters,
    corpus_curate, and cluster_keep_best all pay the label-prop loop
    once — and (b) carry the documents-parquet fingerprint in its key
    so an in-place fixture rewrite yields fresh labels with no manual
    cache clear (the ADVICE-r11 structural-staleness rule)."""
    import os

    from cs686_big_data_p1_spark.operators.llm import (
        cluster_labels,
        dedup_clusters,
    )

    sf = str(tmp_path)
    path = f"{sf}/documents.parquet"

    def write_docs(texts):
        spark.createDataFrame(
            [
                (i, t, "en", "web", len(t))
                for i, t in enumerate(texts)
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(path)
        os.utime(
            path,
            ns=(
                os.stat(path).st_mtime_ns + 1,
                os.stat(path).st_mtime_ns + 1,
            ),
        )

    base = "the quick brown fox jumps over the lazy dog " * 8
    write_docs([base, base + "near", "zz totally different text qq " * 9])
    a = cluster_labels(spark, sf)
    b = dedup_clusters(spark, sf)
    assert a is b  # one materialization serves every consumer
    first = {(r.doc_id, r.cluster_id) for r in a.collect()}
    assert first  # the two near-dup docs clustered

    # Rewrite the fixture: different docs, different duplicate shape.
    other = "completely other corpus words flow here nicely " * 8
    write_docs([other, other + "x", other + "y", "lone doc " * 20])
    fresh = {(r.doc_id, r.cluster_id) for r in cluster_labels(spark, sf).collect()}
    assert fresh != first  # stale labels would have been served pre-fix
    registry.clear_caches()
