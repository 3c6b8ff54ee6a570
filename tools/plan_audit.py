"""Physical-plan audit: assert the plan properties the 100 TB design
rules require (SURVEY.md §4.3) and dump the formatted plans.

Checks, per audited query:
  * scan pruning   — each parquet scan is resolved to its table via the
                     plan's Location, and its ReadSchema column count is
                     compared against THAT table's own schema (bracket-
                     aware, so nested structs count as one column). A
                     fact-table scan reading every column fails.
  * broadcast      — queries joining a small dimension show
                     BroadcastHashJoin / BroadcastExchange, not a
                     SortMergeJoin on the dim side;
  * broadcast side — no BroadcastExchange whose subtree contains a scan
                     of a FACT table (orders/lineitem/events/documents/
                     embeddings). Queries that intentionally broadcast a
                     bounded derivative of a fact (e.g. a LIMITed query
                     side) opt out with fact_broadcast_ok.
  * codegen        — at least one WholeStageCodegen span (the scan+
                     filter+project pipeline is compiled, not
                     interpreted);
  * no cartesian   — no CartesianProduct node anywhere (cross joins
                     must be broadcast-nested-loop over a broadcast
                     side).

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md
Exit code 1 if any assertion fails.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

from cs686_big_data_p1_spark.plans import (  # noqa: E402
    descendant_scan_ids,
    formatted_plan,
    parse_tree,
    scan_read_counts,
    scan_tables,
    unpartitioned_window_ids,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# Tables that scale with the data (never broadcast-safe at 100 TB).
FACT_TABLES = {"orders", "lineitem", "events", "documents", "embeddings"}

# query -> properties to assert. broadcast: the query joins a
# broadcast-worthy side; pruned: every resolved fact scan must read a
# strict column subset; fact_broadcast_ok: the query deliberately
# broadcasts a bounded derivative of a fact table (limit / tiny agg).
AUDITS: dict[str, dict] = {
    # HRW placement: the broadcast side is the online-node list (a
    # per-node aggregate of the heartbeat stream), chunk side streams
    "rendezvous_placement": {
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "online list = per-node aggregate, O(#nodes)",
        "max_waived": 2,  # liveness cutoff + node list branches
    },
    # PQ ADC search: the per-query distance table is the broadcast side,
    # an Aggregate over the vec_id < ANN_N_QUERIES slice (O(q x M x K))
    "knn_pq_adc": {
        "broadcast": True,
        "bounded_broadcast": "distance table = Aggregate over the "
        "vec_id < ANN_N_QUERIES slice, O(n_queries x PQ_M x PQ_K)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 2,
    },
    # HLL sketch: the only broadcast is the exact-distinct CONTRAST leg
    # (an O(#event_types) aggregate); the sketch itself is a groupBy
    "hll_distinct": {
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "exact-distinct contrast leg = per-group "
        "aggregate, O(#event_types)",
    },
    # Count-Min: the broadcast is the sketch itself — an Aggregate
    # bounded at CMS_D x CMS_W counter rows regardless of input size
    "cms_topk": {
        "broadcast": True,
        "bounded_broadcast": "counter array = (k, pos) aggregate, "
        "<= CMS_D*CMS_W = 2048 rows",
        "max_waived": 2,  # counters + the top-N (TakeOrdered) probe side
    },
    # Z-order layout: bounds (1-row agg), preds (2 rows from bounds),
    # and matched (2-row agg) all broadcast; zones stay distributed
    "zorder_layout": {
        "broadcast": True,
        "bounded_broadcast": "bounds/preds/matched = 1-2 row aggregates "
        "over lineitem",
        # the cached morton frame's subtree (which itself contains the
        # bounds broadcast) is spliced into BOTH consumer legs by the
        # InMemoryRelation printout, so the census sees each bounded
        # exchange up to twice
        "max_waived": 8,
    },
    "reservoir_sample": {"codegen": True},
    # KMV set algebra: n_common and the exact-contrast leg broadcast
    # (1-row aggregates); the sketch rows never exceed O(K)
    "kmv_set_ops": {
        "broadcast": True,
        "bounded_broadcast": "n_common / exact contrast = 1-row "
        "aggregates; sketch legs are O(K) rows",
        "max_waived": 3,
    },
    # Weighted systematic sample: carry-in offsets (O(#shards) agg) and
    # stride/offset params (1-row agg) broadcast; docs stream through
    "weighted_sample_systematic": {
        "broadcast": True,
        "bounded_broadcast": "offsets = O(#shards) aggregate; "
        "stride/offset params = 1-row aggregate",
        "max_waived": 2,
    },
    "tpch_q1_pricing": {"pruned": True, "codegen": True},
    "tpch_q3_shipping": {"pruned": True, "broadcast": True, "codegen": True},
    "tpch_q5_localsupp": {"pruned": True, "broadcast": True, "codegen": True},
    "topk_orders_per_customer": {"pruned": True, "codegen": True},
    # liveness queries broadcast the per-node max(ts) aggregate of the
    # heartbeat stream — bounded by cluster size (#nodes), not data size
    "dead_nodes": {
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "offline list = per-node aggregate, O(#nodes)",
        # scalar liveness-cutoff aggregate + per-node offline list (the
        # cache-free standalone plan exposes both; both Aggregate-bounded)
        "max_waived": 2,
    },
    "replicas_on_offline_nodes": {
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "offline list = per-node aggregate, O(#nodes)",
        "max_waived": 3,  # cutoff aggregate + offline list on two branches
    },
    "under_replicated": {
        "codegen": True,
        "bounded_broadcast": "online list = per-node aggregate, O(#nodes)",
        "max_waived": 3,  # online list probed on three plan branches
    },
    "checksum_join": {"codegen": True},
    # the largest-row control-plane queries: must stay exchange-light
    # and cartesian-free at any SF
    "publish_upsert": {"codegen": True},
    "replicas_after_corruption": {"codegen": True},
    "placement_candidates": {
        "codegen": True,
        "bounded_broadcast": "node list = cluster inventory, O(#nodes)",
        "max_waived": 6,  # node/online lists reused across plan branches
    },
    "file_manifest": {"codegen": True},
    "surviving_replicas": {
        "codegen": True,
        "bounded_broadcast": "offline list = per-node aggregate, O(#nodes)",
        "max_waived": 3,
    },
    "dedup_exact": {"pruned": True, "codegen": True},
    "dedup_near": {"codegen": True},
    # ann queries broadcast the LIMITed query side (bounded by design)
    "ann_lsh": {
        "broadcast": True,
        "bounded_broadcast": "query side bounded by vec_id < ANN_N_QUERIES "
        "predicate (a Filter, not a Limit node)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 2,  # bucketed probe side + query-embedding side
    },
    "knn_ivf": {
        "broadcast": True,
        "bounded_broadcast": "query side bounded by vec_id < ANN_N_QUERIES "
        "predicate (a Filter, not a Limit node)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 4,  # centroids, probes, probe-join reuse, query side
    },
    "ivf_range_search": {
        # knn_ivf's candidate generation with a radius Filter instead
        # of a top-k window: centroid/probe/query sides broadcast
        # (Filter-bounded slices), no window at all.
        "broadcast": True,
        "bounded_broadcast": "query/centroid sides bounded by vec_id "
        "predicates (Filters); radius cut is a Filter, not a window",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 4,
    },
    "sq_reconstruct_error": {
        # one corpus pass fuses encode+decode+error into the scan
        # projection; broadcasts are the Filter-bounded centroid slice
        # and the sample-cap trainer aggregate; output is an O(nlist)
        # groupBy rollup.
        "broadcast": True,
        "bounded_broadcast": "centroid slice (Filter) + sample-cap "
        "(vmin,vmax) trainer aggregate; rollup output O(nlist)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 4,
    },
    "knn_ivf_binary": {
        # sign-bit codec: no trainer at all; broadcasts are the
        # Filter-bounded centroid/probe/query slices; ADC shuffles
        # 8-byte codes; refine touches SHORTLIST rows per query.
        "broadcast": True,
        "bounded_broadcast": "query/centroid sides bounded by vec_id "
        "predicates (Filters); codec is data-independent (no trainer)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 5,
    },
    "knn_mrl": {
        # prefix-renormalized shortlist: first stage reads only the
        # MRL_DIM slice (fused into the scan projection); query side
        # broadcast (Filter-bounded); full-dim reads are the
        # SHORTLIST refine only.
        "broadcast": True,
        "bounded_broadcast": "query side bounded by vec_id predicate "
        "(Filter); prefix slice fused into the scan projection",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 4,
    },
    "mrl_recall_compare": {
        # composes two audited knn_mrl funnels + the brute-force
        # truth; joins are int pairs; output is a 2-row aggregate.
        "broadcast": True,
        "bounded_broadcast": "legs are the audited funnel pipelines; "
        "hit joins are int pairs; 2-row method table + 1-row count",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 8,
    },
    "knn_ivf_append": {
        "broadcast": True,
        "bounded_broadcast": "frozen codebook (nlist-row checkpoint) + "
        "query side bounded by vec_id < ANN_N_QUERIES predicate",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 5,  # codebook x3 passes, probes, refine query side
    },
    "ivf_imbalance": {
        "broadcast": True,
        "bounded_broadcast": "frozen codebook (nlist-row checkpoint) + "
        "the 1-row (n_total, n_cells) aggregate",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 4,  # codebook x2 passes + totals row
    },
    # cluster_keep_best: dedup_clusters' checkpointed labels joined to
    # the map-side quality projection, then ONE groupBy max_by — the
    # label-prop rounds themselves are audited under dedup_clusters.
    "cluster_keep_best": {"codegen": True},
    # embedding_drift: single map-side explode + d-cell groupBy; no
    # join at all, so only pruning/codegen to assert.
    "embedding_drift": {"pruned": ["embeddings"], "codegen": True},
    "dedup_embedding": {"codegen": True},
    # embeddings is 3 columns, all genuinely needed (id, label, vector)
    "doc_embedding_join": {"pruned": ["documents"], "codegen": True},
    "hb_tumbling": {"codegen": True},
    # corpus-curation map-stages: no shuffle of their own, pruned scans
    "stratified_sample": {"pruned": True, "codegen": True},
    "pii_scrub": {"codegen": True},
    "repetition_score": {"codegen": True},
    "corpus_filter": {"codegen": True},
    "vocab_topk": {"codegen": True},
    "oov_rate": {
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "vocab side is LIMITed to VOCAB_K rows",
    },
    "dataset_split": {"pruned": True, "codegen": True},
    "sequence_pack": {
        "codegen": True,
        "bounded_broadcast": "per-(lang,shard) offset table ~ corpus/"
        "PACK_SHARD_SPAN rows (pipeline.py growth rule: ~1e5 at 1e11 docs)",
    },
    "price_median": {
        "pruned": True,
        "codegen": True,
        "bounded_broadcast": "per-priority count table, 5 rows",
    },
    "priority_pivot": {"pruned": True, "codegen": True},
    "asof_join": {"pruned": True, "codegen": True},
    "range_join_views": {"pruned": True, "codegen": True},
    # r5 additions — extended TPC-H coverage
    "tpch_q6_forecast": {"pruned": True, "codegen": True},
    "tpch_q7_volume": {"pruned": True, "broadcast": True, "codegen": True},
    "tpch_q8_marketshare": {"pruned": True, "broadcast": True, "codegen": True},
    "tpch_q10_returns": {"pruned": True, "broadcast": True, "codegen": True},
    "tpch_q13_custdist": {"pruned": True, "codegen": True},
    "tpch_q14_promo": {"pruned": True, "codegen": True},
    "tpch_q18_bigorders": {"pruned": True, "codegen": True},
    "tpch_q19_brackets": {"pruned": True, "codegen": True},
    "tpch_q22_prospects": {
        "codegen": True,
        "bounded_broadcast": "scalar avg-balance aggregate, 1 row",
    },
    # r6 additions — SimHash pair stage
    "dedup_simhash_pairs": {"pruned": ["documents"], "codegen": True},
    # r6 additions — remaining partsupp-free TPC-H shapes
    "tpch_q12_shipmode": {"pruned": True, "codegen": True},
    "tpch_q15_topsupplier": {
        "pruned": True,
        "codegen": True,
        "bounded_broadcast": "scalar max-revenue aggregate, 1 row",
    },
    "tpch_q17_smallqty": {"pruned": True, "codegen": True},
    "tpch_q21_waiting": {"pruned": True, "codegen": True},
    # r6 additions — partsupp-derived TPC-H queries (22/22 complete)
    "tpch_q2_mincost": {"pruned": True, "broadcast": True, "codegen": True},
    "tpch_q9_profit": {"pruned": True, "broadcast": True, "codegen": True},
    "tpch_q11_stockvalue": {
        "pruned": True,
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "scalar total-value aggregate, 1 row",
    },
    "tpch_q16_partcount": {"pruned": True, "codegen": True},
    "tpch_q20_promotion": {"pruned": True, "broadcast": True, "codegen": True},
    # r6 additions — exact heavy hitters + sweep-line concurrency
    "heavy_hitters": {
        "pruned": ["documents"],
        "codegen": True,
        "bounded_broadcast": "corpus token total, 1 row",
    },
    "max_concurrency": {
        "pruned": ["events"],
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "per-day carry-in offsets, O(#days) rows",
    },
    # bfs_distances' final plan reads the last loop checkpoint (same
    # checkpoint-cut rationale as pagerank/triangle_count)
    "bfs_distances": {"codegen": True},
    "skyline_orders": {"pruned": ["orders"], "codegen": True},
    # bpe_encode joins the corpus against the checkpointed vocabulary
    "bpe_encode": {"pruned": ["documents"], "codegen": True},
    "remove_boilerplate": {"pruned": ["documents"], "codegen": True},
    "phrase_search": {"pruned": ["documents"], "codegen": True},
    "cusum_changepoints": {"pruned": ["events"], "codegen": True},
    "allpairs_cosine": {"pruned": ["documents"], "codegen": True},
    "pca_project": {"pruned": ["embeddings"], "codegen": True},
    "priority_sets": {"pruned": ["orders"], "codegen": True},
    "hard_negatives": {
        "broadcast": True,
        "bounded_broadcast": "query side bounded by vec_id < KNN_N_QUERIES "
        "predicate (a Filter, not a Limit node)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 1,
    },
    "aqp_revenue": {"pruned": ["orders"], "codegen": True},
    # customer_rfm / customer_value_deciles read the two-phase rank's
    # checkpointed per-customer aggregate (the _two_phase_global_rank
    # lineage cut), so no parquet scan is visible to assert pruning on
    # — same rationale as triangle_count/bfs_distances; their broadcast
    # sides (1-row extrema, <= RANK_BUCKETS-row offsets) sit above the
    # checkpoint too.
    "customer_rfm": {"codegen": True},
    "event_session_assign": {"pruned": ["events"], "codegen": True},
    "attribution_credit": {"pruned": ["events"], "codegen": True},
    "coverage_time": {
        "pruned": ["events"],
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "per-day summary/carry-ins, O(#days) rows",
        "max_waived": 2,  # carry-in probe + final per-day summary join
    },
    "dau_wau": {"pruned": ["events"], "codegen": True},
    "ab_test_conversion": {"pruned": ["events"], "codegen": True},
    "knn_graph": {"pruned": True, "codegen": True},
    "value_histogram": {
        "pruned": ["events"],
        "codegen": True,
        "bounded_broadcast": "value extrema, 1 row",
    },
    "negative_sampling": {
        "pruned": ["documents"],
        "codegen": True,
        "bounded_broadcast": "corpus count, 1 row",
    },
    "event_transitions": {
        "pruned": ["events"],
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "row-sum normalizer, O(#event_types) rows",
    },
    # r5 additions — corpus curation / ER / time-series / incremental dedup
    "doc_chunk": {"pruned": ["documents"], "codegen": True},
    "span_dedup": {"pruned": ["documents"], "codegen": True},
    # r10: stride-1 window digests; the scan must read only doc_id+text
    "substring_dedup": {"pruned": ["documents"], "codegen": True},
    # r10: quantile sketch; scan reads (event_type, event_id, value)
    "kll_quantiles": {"pruned": ["events"], "codegen": True},
    "tfidf_topterms": {
        "pruned": ["documents"],
        "codegen": True,
        "bounded_broadcast": "corpus doc-count scalar, 1 row",
    },
    "lexical_diversity": {"pruned": ["documents"], "codegen": True},
    "domain_mix": {
        "codegen": True,
        "bounded_broadcast": "corpus-total aggregate, 1 row",
    },
    "text_normalize": {"pruned": ["documents"], "codegen": True},
    "decontaminate": {"pruned": ["documents"], "codegen": True},
    "event_sessionize": {"pruned": True, "codegen": True},
    "event_funnel": {"pruned": True, "codegen": True},
    "fuzzy_name_match": {"pruned": ["part"], "codegen": True},
    "gapfill_ffill": {"pruned": True, "codegen": True},
    "rolling_stats": {"pruned": True, "codegen": True},
    "event_value_quantiles": {"pruned": True, "codegen": True},
    "anomaly_zscore": {"pruned": True, "codegen": True},
    "dedup_incremental": {"pruned": ["documents"], "codegen": True},
    # r7 additions
    "knn_ivfpq": {
        "broadcast": True,
        "bounded_broadcast": "query side bounded by vec_id < ANN_N_QUERIES "
        "predicate (a Filter, not a Limit node)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 5,  # centroids, probes, ADC dtable side, refine query side
    },
    # r14 additions
    "knn_ivfpq_residual": {
        "broadcast": True,
        "bounded_broadcast": "per-probed-cell ADC tables + centroid "
        "sub-vector slices, both bounded by the vec_id range / "
        "query-count Filters (never the corpus)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        # cents slices (assign + residual + query-residual), probes,
        # assigned, per-cell ADC tables, refine query side — every one
        # Filter/Aggregate-bounded (measured: 10 exchanges at sf0.01)
        "max_waived": 10,
    },
    "ivf_store_delete": {
        "broadcast": True,
        "bounded_broadcast": "frozen codebook (O(nlist) id-slice Filter) "
        "+ the decontamination drop set (tau-thresholded hit aggregate)",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 6,
    },
    "event_props_extract": {"pruned": True, "codegen": True},
    "priority_unpivot": {"pruned": True, "codegen": True},
    "domain_resample": {
        "pruned": True,
        "codegen": True,
        "bounded_broadcast": "per-stratum rate table (#langs rows) + its "
        "1-row min aggregate",
        "max_waived": 2,
    },
    "approx_quantiles": {"pruned": True, "codegen": True},
    "customer_value_deciles": {"codegen": True},
    "scd2_user_state": {"pruned": True, "codegen": True},
    "minhash_estimate_error": {"pruned": ["documents"], "codegen": True},
    "embedding_stats": {"pruned": True, "codegen": True},
    "referential_integrity": {"pruned": True, "broadcast": True, "codegen": True},
    "table_profile": {"pruned": True, "codegen": True},
    "nation_reconcile": {"broadcast": True, "codegen": True},
    "inverted_index": {"pruned": ["documents"], "codegen": True},
    "bm25_search": {
        "pruned": ["documents"],
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "df = per-query-term aggregate (|Q| rows); "
        "corpus stats = 1-row aggregate",
        "max_waived": 2,
    },
    "dsir_weights": {
        "pruned": ["documents"],
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "target selector = 1-row aggregate; bucket "
        "ratio table = DSIR_BUCKETS-row aggregate",
        "max_waived": 2,
    },
    # mmr_rerank's greedy rounds execute behind eager localCheckpoints
    # during plan construction (the customer_rfm two-phase-rank
    # treatment), so its FINAL plan is a union of checkpointed 1-row
    # scans — nothing left to census. The per-round shapes (bounded
    # BM25_K-row broadcast nested-loop sim matrix, argmax TakeOrdered)
    # are pinned by tests/test_search_graph.py instead.
    "mmr_rerank": {},
    # gram_power_topvec's corpus pass (the Arrow-kernel partial-Gram
    # mapInPandas + d^2-cell groupBy) runs eagerly at construction; the
    # iterations are bounded O(d^2) driver-side numpy (the PCA-moments
    # class), so its final plan is a 64-row LocalTableScan. The Gram
    # build and the integer recurrence are pinned by the bit-exact
    # numpy replay in tests/test_linalg.py.
    "gram_power_topvec": {},
    "dsir_sample": {
        "pruned": ["documents"],
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "dsir_weights' 1-row target + bucket-ratio "
        "aggregates, plus the sampler's O(#shards) offsets and 1-row "
        "stride params — the cached dsir subtree (which contains the "
        "target+ratio exchanges) is spliced into the sampler's cum/"
        "offsets/params branches by the InMemoryRelation printout, so "
        "the census sees each bounded exchange several times (the "
        "zorder_layout precedent)",
        "max_waived": 10,
    },
    "collocations_lift": {
        "pruned": ["documents"],
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "unigram counts = vocabulary-sized aggregate "
        "(broadcast twice: a-side and b-side); N = 1-row aggregate",
        "max_waived": 3,
    },
    "pagerank_copurchase": {"codegen": True},
    "retention_cohorts": {"pruned": ["events"], "codegen": True},
    "bpe_merges": {"codegen": True},
    "embedding_covariance": {
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "means = d-row aggregate (broadcast twice: "
        "i-side and j-side); n = 1-row aggregate",
        "max_waived": 3,
    },
    # triangle_count's final plan reads the checkpointed oriented-edge
    # RDD, so no parquet scan is visible to assert pruning on (the
    # pruning happened upstream of the checkpoint, same as pagerank)
    "triangle_count": {"codegen": True},
    # round-8 additions
    "domain_caps": {"pruned": ["documents"], "codegen": True},
    "ohlc_hourly": {"pruned": ["events"], "codegen": True},
    "lm_score": {
        "pruned": ["documents"],
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "LM model tables are top-K pruned "
        "(orderBy+limit -> TakeOrdered) or 1-row aggregates before "
        "broadcasting; the corpus itself never broadcasts",
        "max_waived": 3,  # bimodel, unimodel, total-token count
    },
    # lm_quality_band's final plan reads the rank helper's eager
    # checkpoint of the lm_score output, so no parquet scan is visible
    # (lm_score's own pruning is audited above); the global-window
    # sweep covers its bounded histogram window
    "lm_quality_band": {"codegen": True},
    "event_debounce": {"pruned": ["events"], "codegen": True},
    "knn_label_eval": {
        "broadcast": True,
        "codegen": True,
        "bounded_broadcast": "query side bounded by vec_id < KNN_N_QUERIES "
        "predicate (a Filter, not a Limit node); label/truth probes on the "
        "queries*k result",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 3,
    },
    # --- top-cost bench lines (VERDICT r14 #2): every query in the
    # bench's top-10 now has its own plan section. These compose 2-5
    # full index pipelines by design, so their waived-exchange budgets
    # are the SUM of their audited legs' budgets; the ceilings below
    # are the exact counts measured from the committed plans — one
    # unintended extra fact broadcast still fails the audit.
    # dedup_ngram deliberately carries NO explicit broadcast hints: its
    # joins are digest-only shuffles on gram/doc keys with df-capped
    # posting lists (the caps are Aggregates in-plan), which is the
    # shape that survives 100 TB — under the audit's disabled
    # auto-broadcast they all compile to shuffle joins, so the audit
    # asserts pruning + no cartesian instead of a broadcast.
    "dedup_ngram": {"pruned": ["documents"], "codegen": True},
    "ann_recall": {
        "broadcast": True,
        "bounded_broadcast": "knn_ivf + brute-force truth legs: query "
        "sides bounded by the vec_id < ANN_N_QUERIES Filter, centroid "
        "slices by the O(nlist) id Filter, probes/top-k by aggregates",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 9,
    },
    "ann_recall_all": {
        "broadcast": True,
        "bounded_broadcast": "five complete index pipelines vs truth "
        "(the cost IS the feature): every exchange is a Filter-bounded "
        "query/centroid slice or a cap-bounded training/probe aggregate",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 17,
    },
    "pq_recall_compare": {
        "broadcast": True,
        "bounded_broadcast": "four full quantizer pipelines vs truth "
        "(raw PQ / residual PQ / SQ8 / binary): Filter-bounded query "
        "and centroid slices, cap-bounded codebooks and distance "
        "tables; the binary leg has no trainer, only slice broadcasts",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 28,
    },
    "ivf_retrain": {
        "broadcast": True,
        "bounded_broadcast": "two full trainings by definition (before/"
        "after): Filter-bounded seed/query slices + cap-bounded Lloyd "
        "sample and codebook aggregates on both phases",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 16,
    },
    "ivf_store_vacuum": {
        # store reads are the temp cid-partitioned store (not a fixture
        # fact table); the only broadcasts are bounded metadata sides
        # (tombstone counts, drop-set assignment) — no fact-table
        # exchange may appear at all.
        "broadcast": True,
    },
    "knn_ivf_store_live": {
        "broadcast": True,
        "bounded_broadcast": "query slice bounded by the vec_id < "
        "ANN_N_QUERIES Filter; probes by the frozen-codebook aggregate; "
        "candidates come off the partition-pruned store, not a fixture "
        "fact scan",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 2,
    },
    "knn_ivf_sq": {
        "broadcast": True,
        "bounded_broadcast": "SQ8 search: Filter-bounded query/centroid "
        "slices, sample-cap (vmin,vmax) trainer aggregate, ADC "
        "shortlist aggregates",
        "waiver_bound_nodes": ("Filter", "Aggregate", "Limit", "TakeOrdered"),
        "max_waived": 5,
    },
    "ivf_release_versions": {
        # reads the published snapshot versions (temp table, not a
        # fixture fact scan); diffs shuffle on vec_id; the only
        # broadcasts are the one-row diff-count aggregates.
        "broadcast": True,
    },
}


# Suite-wide guard: NO query may contain an unpartitioned WindowExec
# over unbounded input (the whole table funneling through one task).
# Every exception below runs its global window over a provably BOUNDED
# row set and says why; "max" caps how many such windows the plan may
# contain, so an unbounded one regressing into a waived query still
# fails. Queries not listed here must have zero unpartitioned windows.
GLOBAL_WINDOW_WAIVERS: dict[str, dict] = {
    "max_concurrency": {
        "max": 1,
        "reason": "cumulative carry-in over the O(#days) day summary",
    },
    "coverage_time": {
        "max": 2,
        "reason": "carry-in + midnight-credit windows over the "
        "O(#days) day summary",
    },
    "bm25_search": {
        "max": 1,
        "reason": "rank over the post-LIMIT top-K rows (<= BM25_K)",
    },
    "vocab_topk": {
        "max": 1,
        "reason": "rank over the post-LIMIT top-K rows (<= VOCAB_K)",
    },
    # Each two-phase rank's eager localCheckpoint executes during plan
    # construction, so the FINAL formatted plan carries exactly one
    # cumulative-offset window (Spark fuses the two frame variants)
    # over the bounded <= ~2*RANK_BUCKETS composite histogram — even
    # customer_rfm's three chained ranks surface only the last one.
    # tests/test_plan_guards.py pins the same cap plus the
    # histogram-subtree shape.
    "customer_value_deciles": {
        "max": 1,
        "reason": "cumulative offsets over the bounded composite "
        "(_bkt, _sub) histogram (two-phase global rank, phase 2)",
    },
    "customer_rfm": {
        "max": 1,
        "reason": "last of three two-phase ranks (earlier ranks are "
        "behind eager checkpoints); bounded composite histogram",
    },
    "lm_quality_band": {
        "max": 1,
        "reason": "two-phase rank over the per-doc LM score: cumulative "
        "offsets over the bounded composite (_bkt, _sub) histogram",
    },
    "weighted_sample_systematic": {
        "max": 1,
        "reason": "carry-in over the O(#shards) per-shard weight "
        "aggregate (pack_sequences two-phase cumsum, phase 2)",
    },
    "dsir_sample": {
        "max": 1,
        "reason": "the composed sampler's carry-in over the O(#shards) "
        "per-shard weight aggregate (same window weighted_sample_"
        "systematic waives)",
    },
    "kmv_set_ops": {
        "max": 1,
        "reason": "rank over the <= 2K merged sketch rows (segment "
        "sketches are two-stage bottom-k, cap_domains idiom)",
    },
    "compaction_plan": {
        "max": 1,
        "reason": "carry-in over the O(#files) per-file byte totals "
        "(pack_sequences two-phase cumsum, phase 2)",
    },
    "hybrid_search": {
        "max": 2,
        "reason": "the nested bm25 leg's rank over its post-LIMIT "
        "top-K plus the RRF rank over the fused union of two top-K "
        "lists (<= BM25_K + ANN_K rows, both legs LIMIT-bounded)",
    },
    "pq_encode": {
        "max": 1,
        "reason": "md5-order rank over the post-LIMIT PQ_TRAIN_CAP "
        "codebook-training sample (cap-bounded, never the corpus)",
    },
    "knn_ivfpq": {
        "max": 1,
        "reason": "md5-order rank over the post-LIMIT PQ_TRAIN_CAP "
        "codebook-training sample (cap-bounded, never the corpus)",
    },
    "ann_recall_all": {
        "max": 1,
        "reason": "the composed knn_ivfpq leg's md5-order rank over "
        "its post-LIMIT PQ_TRAIN_CAP training sample (cap-bounded)",
    },
    "knn_ivf_append": {
        "max": 1,
        "reason": "seed row_number over the bounded O(nlist) base-id "
        "slice (vec_id < ANN_N_QUERIES + span filter), never the corpus",
    },
    "ivf_imbalance": {
        "max": 1,
        "reason": "the composed _append_parts seed row_number over the "
        "bounded O(nlist) base-id slice, never the corpus",
    },
    "ivf_store_prune": {
        "max": 1,
        "reason": "the composed _append_parts seed row_number over the "
        "bounded O(nlist) base-id slice, never the corpus (the store "
        "build itself runs at construction time)",
    },
}


def audit_global_windows(spark) -> list[str]:
    """Sweep EVERY registered batch query's physical plan for
    unpartitioned Window nodes; fail any not covered by an explicit
    bounded-input waiver. Streaming queries are skipped — their
    registry callables drain to an in-memory batch whose plan is a
    LocalTableScan (state sizing is pytest-audited instead)."""
    from cs686_big_data_p1_spark import registry

    failures: list[str] = []
    lines: list[str] = []
    for name, fn in sorted(registry.QUERIES.items()):
        if name.startswith("stream_"):
            continue
        try:
            plan = formatted_plan(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            lines.append(f"* {name}: PLAN ERROR {e}")
            continue
        finally:
            registry.clear_caches()
        ids = unpartitioned_window_ids(plan)
        if not ids:
            continue
        waiver = GLOBAL_WINDOW_WAIVERS.get(name)
        if waiver is None:
            failures.append(name)
            lines.append(
                f"* {name}: FAIL — unpartitioned Window node(s) {ids} "
                "with no bounded-input waiver"
            )
        elif len(ids) > waiver["max"]:
            failures.append(name)
            lines.append(
                f"* {name}: FAIL — {len(ids)} unpartitioned Windows "
                f"{ids} exceed waiver max={waiver['max']}"
            )
        else:
            lines.append(
                f"* {name}: {len(ids)} unpartitioned Window(s) waived "
                f"— {waiver['reason']}"
            )
    print("## Global-window sweep (all batch queries) — "
          + ("FAIL" if failures else "ok") + "\n")
    for ln in lines:
        print(ln)
    print()
    return failures


BOUNDING_NODES = ("Aggregate", "Limit", "TakeOrdered")


def subtree_bounds_cardinality(node, bound_nodes=BOUNDING_NODES) -> bool:
    """True if the subtree contains a node that bounds its output rows
    (aggregate or limit by default) — the shape every legitimate
    bounded-broadcast waiver must have between the exchange and the
    fact scan. Queries whose bound is a selective predicate (the ANN
    query sides' vec_id < N) widen bound_nodes to accept Filter,
    trading precision for the explicit per-query annotation."""
    todo = list(node.children)
    while todo:
        n = todo.pop()
        if any(b in n.name for b in bound_nodes):
            return True
        todo.extend(n.children)
    return False


def audit_cluster_round(spark) -> list[str]:
    """Assert one dedup_clusters propagation round executes the
    neighbor join exactly once: the post-neighbor labels are
    materialized before the pointer-jump join reads them twice, so the
    round's physical plan past the checkpoint must contain no
    HashAggregate (the neighbor groupBy) and exactly one join."""
    from cs686_big_data_p1_spark.operators.llm import _cluster_round

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "doc_a long, doc_b long"
    ).localCheckpoint(eager=True)
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], "v long, label long"
    ).localCheckpoint(eager=True)
    plan = formatted_plan(_cluster_round(edges, labels))
    problems = []
    if "HashAggregate" in plan:
        problems.append(
            "cluster_round: neighbor-join Aggregate leaked past the "
            "round checkpoint (subtree would execute twice per round)"
        )
    n_joins = sum(1 for n in parse_tree(plan) if "Join" in n.name)
    if n_joins > 1:
        problems.append(
            f"cluster_round: {n_joins} joins in post-checkpoint round "
            "plan (expected 1 — the pointer-jump join only)"
        )
    print("## dedup_clusters round plan — "
          + ("FAIL: " + "; ".join(problems) if problems else "ok") + "\n")
    print("```")
    print(plan.strip())
    print("```\n")
    return problems


def main() -> int:
    from cs686_big_data_p1_spark import registry
    from cs686_big_data_p1_spark.session import get_spark
    from cs686_big_data_p1_spark.tables import SCHEMAS

    registry.load_all()
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # Disable statistics-based auto-broadcast: at sf0.01 every table sits
    # under the 10 MB threshold, so Catalyst statically broadcasts fact
    # tables it never would at 100 TB. With the threshold off, any
    # BroadcastExchange left in the plan comes from an explicit
    # broadcast() hint — exactly the set that persists at scale, which
    # is what the fact-broadcast check must audit.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    failures: list[str] = []
    print("# Physical plan audit\n")
    print(f"sf_dir: `{SF_DIR}`\n")
    for name, want in AUDITS.items():
        # audit each query's standalone plan: a prior query's live
        # track_cache would otherwise splice its own (already-executed)
        # InMemoryRelation subtree into this plan and shift the
        # exchange census with audit ORDER, not query shape
        registry.clear_caches()
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = formatted_plan(df)
        nodes = parse_tree(plan)
        tables = scan_tables(plan)
        reads = scan_read_counts(plan)
        problems = []
        pruned = want.get("pruned")
        if pruned:
            if not reads:
                problems.append("no parquet ReadSchema found")
            must_prune = FACT_TABLES if pruned is True else set(pruned)
            for sid, ncols in reads.items():
                tbl = tables.get(sid)
                if tbl in must_prune and tbl in SCHEMAS:
                    total = len(SCHEMAS[tbl].fields)
                    if ncols >= total:
                        problems.append(
                            f"scan ({sid}) reads all {total} columns of {tbl}"
                        )
        if want.get("broadcast") and "Broadcast" not in plan:
            problems.append("no broadcast join in plan")
        waiver = want.get("bounded_broadcast")
        # The waiver is exchange-scoped, not query-scoped: each waived
        # BroadcastExchange must visibly bound its own cardinality (an
        # Aggregate / Limit / TakeOrdered between the exchange and the
        # fact scan), and at most max_waived exchanges may claim it —
        # so an unintended second fact broadcast regressing into a
        # waived query still fails the audit.
        max_waived = want.get("max_waived", 1)
        n_waived = 0
        for n in nodes:
            if "BroadcastExchange" in n.name:
                bad = sorted(
                    tables[sid]
                    for sid in descendant_scan_ids(n)
                    if tables.get(sid) in FACT_TABLES
                )
                if not bad:
                    continue
                bound_nodes = want.get("waiver_bound_nodes", BOUNDING_NODES)
                if waiver and not subtree_bounds_cardinality(n, bound_nodes):
                    problems.append(
                        f"BroadcastExchange ({n.id}) over {bad} claims "
                        "waiver but has no Aggregate/Limit bounding node "
                        "in its subtree"
                    )
                elif waiver and n_waived >= max_waived:
                    problems.append(
                        f"BroadcastExchange ({n.id}) over {bad} exceeds "
                        f"max_waived={max_waived} bounded-broadcast "
                        "exchanges for this query"
                    )
                elif waiver:
                    n_waived += 1
                    print(
                        f"note: {name} BroadcastExchange ({n.id}) over "
                        f"{bad} waived — {waiver}\n"
                    )
                else:
                    problems.append(
                        f"BroadcastExchange ({n.id}) broadcasts fact "
                        f"table(s) {bad} — OOM at scale"
                    )
        if want.get("codegen"):
            # under AQE the un-executed plan exposes no codegen
            # subtrees; compile with AQE off (each AQE stage compiles
            # the same spans at runtime)
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                cg = formatted_plan(
                    registry.QUERIES[name](spark, SF_DIR), mode="codegen"
                )
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
            if not m or int(m.group(1)) < 1:
                problems.append("no WholeStageCodegen span")
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct in plan")
        status = "FAIL: " + "; ".join(problems) if problems else "ok"
        print(f"## {name} — {status}\n")
        print("```")
        print(plan.strip())
        print("```\n")
        if problems:
            failures.append(name)
    if audit_cluster_round(spark):
        failures.append("dedup_clusters_round")
    failures.extend(audit_global_windows(spark))
    if failures:
        print(f"\nFAILED: {failures}", file=sys.stderr)
        return 1
    # The committed PLANS.md carries one "## " section per audited
    # query PLUS the two structural audits above; the log must quote
    # the same total so artifact and log agree (VERDICT r13 #7).
    # Verify, don't assert (ADVICE r14): count the actual "## "
    # headers in the committed PLANS.md and fail on mismatch — the
    # arithmetic is only trustworthy if the artifact agrees.
    n_sections = len(AUDITS) + 2
    # The gate runs this script as `plan_audit.py ... > PLANS.md`:
    # flush stdout so the file on disk holds every section before we
    # count. A mismatch on an ad-hoc terminal run means the committed
    # artifact is stale vs AUDITS — also worth failing loudly on.
    sys.stdout.flush()
    plans_path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    if os.path.isfile(plans_path):
        with open(plans_path) as fh:
            n_committed = sum(
                1 for line in fh if line.startswith("## ")
            )
        if n_committed != n_sections:
            print(
                f"\nFAILED: committed PLANS.md has {n_committed} "
                f"'## ' sections, expected {n_sections} "
                f"({len(AUDITS)} query plans + 2 structural audits)",
                file=sys.stderr,
            )
            return 1
    print(
        f"\nall {n_sections} PLANS.md sections ok "
        f"({len(AUDITS)} query plans + 2 structural audits; "
        f"committed artifact header count verified)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
