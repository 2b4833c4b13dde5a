#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r06 per-query checklist table from the
round-start baseline bench JSON and the end-of-round bench JSON."""
import json, sys

base = json.load(open(sys.argv[1]))["queries"]
final = json.load(open(sys.argv[2]))["queries"]

CAT = {}
def tag(cat, *qs):
    for q in qs: CAT[q] = cat

tag("pinned stratum scheme/verified relations (§1)",
    "q_dup_rate_cr", "q_blocking_scheme")
tag("bounded levenshtein (§2)",
    "q_blocking_recall", "q_lev_pairs", "q_sorted_neighborhood",
    "q_phonetic_pairs", "q_u_sample")
tag("bounded levenshtein via shared fsVectors (§2)",
    "q_fellegi_sunter", "q_fs_em", "q_fs_decisions", "q_tf_adjust",
    "q_monge_elkan", "q_tfidf_pairs")
tag("spread scan-rooted/AQE-coalesced legs (§3)",
    "q_cosine_topk", "q_embed_near_dup", "q_semdedup", "q_ann_lsh",
    "q_pprl", "q_minhash_lsh", "q_simhash", "q_media_phash",
    "q_image_features", "q_video_near_dups", "q_audio_near_dups",
    "q_doc_stats", "q_boilerplate", "q_fingerprint", "q_soundex_blocks")
tag("dictionary codes + codegen merge intersect (§4)", "q_lsh_empirical")
tag("shared thr-free PPJoin ord (§5)",
    "q_prefix_join", "q_er_f1", "q_er_f1_sampled", "q_strategy_f1",
    "q_ari", "q_bcubed", "q_nmi", "q_purity")
tag("levEdges bounded lev + pinned band relation (§2, §3)",
    "q_cc_clusters", "q_center_clusters", "q_threshold_sweep",
    "q_cluster_stability", "q_cross_source_dups", "q_cand_hist",
    "q_label_queue", "q_dedup_cascade", "q_canopy", "q_hac_clusters",
    "q_cluster_cohesion", "q_cluster_groups", "q_survivorship",
    "q_golden_record", "q_bridge_docs", "q_evidence_mst",
    "q_constrained_cc", "q_constrained_must", "q_minhash_err",
    "q_record_linkage", "q_linkage_best", "q_mutual_best", "q_dup_rate",
    "q_threshold_sweep")
tag("pipeline batch: co-partitioned bands, SHUFFLE_HASH, lazy ckpts, kernels (§6-§8)",
    "q_pipeline_clusters", "q_retract_clusters", "q_compare_target",
    "q_swoosh")
tag("ANN probe-stream spread (§3)",
    "q_ann_ivf", "q_ann_recall", "q_ann_pq", "q_ann_ivfpq")

rows = []
for q in sorted(base):
    b, f = base[q], final.get(q, float("nan"))
    cat = CAT.get(q, "examined; left alone (cheap/fixed-cost, see text)")
    rows.append((q, b, f, cat))

print("| query | r6 start | r6 end | treatment |")
print("|---|---|---|---|")
for q, b, f, cat in rows:
    print(f"| {q} | {b:.2f} | {f:.2f} | {cat} |")
tot_b = sum(base.values()); tot_f = sum(final.values())
print(f"\nOperator sweep total: {tot_b:.1f} s -> {tot_f:.1f} s "
      f"({100*(1-tot_f/tot_b):.0f}% less)")
