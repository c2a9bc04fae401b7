import sys
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/repo")
import duckdb
from conftest import compare_with_oracle, SF_CORRECT
from go_mailio_diskusage_handler_spark import registry
from go_mailio_diskusage_handler_spark.session import build_session

spark = build_session("verify-r6")
spark.sparkContext.setLogLevel("ERROR")
ddb = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    ddb.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')")

changed = sys.argv[1:] or [
    "events_funnel_rates", "events_ab_test", "sql_recursive_spine",
    "dedup_minhash", "dedup_incremental_minhash", "dedup_ngram_jaccard",
    "dedup_clusters", "dedup_simhash_pairs", "dedup_ngram_containment",
    "dedup_prefix_jaccard", "dedup_triangles", "dedup_minhash_estimate",
    "dedup_eval_pr", "dedup_pair_editdist",
    "curation_contaminated", "curation_corpus", "curation_keep_best",
    "curation_dedup_report",
    "sim_ivf_ann_topk", "sim_ivfpq_ann_topk", "sim_ivfpq_rerank_topk",
    "dedup_embedding_cosine", "sim_kmeans_train", "sim_kmeans_stats",
    "sim_kmeans_ivf_topk", "dedup_semantic", "sim_eval_recall",
    "sim_eval_recall_ivfpq", "part_affinity_lift", "text_bm25_topk",
    "events_funnel",
]
fails = []
for name in changed:
    if name not in registry.QUERIES:
        print(f"{name}: MISSING from registry", flush=True); fails.append(name); continue
    try:
        compare_with_oracle(spark, ddb, name, registry.QUERIES, registry.ORACLE_SQL)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:300]}", flush=True)
        fails.append(name)
print("FAILS:", fails)
spark.stop()
