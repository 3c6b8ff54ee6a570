

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
