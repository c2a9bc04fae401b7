"""Round-5 additions: heavy hitters, outer joins, eval harnesses.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import core, relational
from ..sources.tables import load_table
from ._base import register
from ..operators import curation, dedup, sessions, text  # noqa: E402
from .q_similarity import _ddb_cosine
from ..operators import similarity  # noqa: E402
from .q_dedup import _CAPPED_SHINGLE_CTES
from .q_du import DU_CORE_SQL
from .. import sql as sql_surface  # noqa: E402
from .q_curation import _SIM_BLOCKS
from .q_curation import _SIMHASH_CTES
from .q_curation import _CLUSTERS_CTES


# ---------------------------------------------------------------------------
# Round-5 additions: corpus n-gram heavy hitters, outer-join
# aggregation (Q13 shape), returns top-k (Q10 shape), event-stream
# first-touch dedup (batch oracle of the streaming
# dropDuplicatesWithinWatermark twin).
# ---------------------------------------------------------------------------
@register(
    "dedup_normalized",
    """
    SELECT sha256(norm) AS norm_sha,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS dup_count
    FROM (SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
          FROM documents)
    GROUP BY norm_sha
    """,
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup after canonical normalization (case/punctuation/
    whitespace) — text.normalized_exact_dedup.  NOTE the oracle's 'g'
    flags: DuckDB regexp_replace is first-match by default while
    Spark's is global."""
    return text.normalized_exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "curation_keep_best",
    f"""
    {_CLUSTERS_CTES},
    m AS (SELECT c.cluster_id, c.doc_id, d.n_chars
          FROM clusters c JOIN documents d ON c.doc_id = d.doc_id)
    SELECT cluster_id, doc_id AS keep_doc_id, n_chars AS keep_n_chars,
           n_members
    FROM (SELECT *, COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
                 ROW_NUMBER() OVER (PARTITION BY cluster_id
                     ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM m) WHERE rn = 1
    """,
)
def curation_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-document representative per duplicate cluster — one
    argmax aggregation, no per-cluster sort
    (curation.keep_best_per_cluster)."""
    return curation.keep_best_per_cluster(
        load_table(spark, sf_dir, "documents"), 0.6
    )


@register(
    "join_spend_reconcile",
    """
    WITH a AS (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spend_early
               FROM orders WHERE o_orderdate < DATE '1997-01-01'
               GROUP BY o_custkey),
    b AS (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spend_late
          FROM orders WHERE o_orderdate >= DATE '1997-01-01'
          GROUP BY o_custkey)
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           COALESCE(a.spend_early, 0) AS spend_early,
           COALESCE(b.spend_late, 0) AS spend_late,
           CASE WHEN a.o_custkey IS NULL THEN 'late_only'
                WHEN b.o_custkey IS NULL THEN 'early_only'
                ELSE 'both' END AS presence
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
)
def join_spend_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconcile of two pre-aggregated periods
    (relational.spend_reconciliation) — the join type for two-source
    reconciliation; same-table diffs use the cheaper single-groupBy
    `inventory_diff` form."""
    return relational.spend_reconciliation(
        load_table(spark, sf_dir, "orders"), "1997-01-01"
    )


@register(
    "dedup_pair_editdist",
    f"""
    WITH {_SIMHASH_CTES},
    blocks AS ({_SIM_BLOCKS}),
    pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
              FROM blocks a JOIN blocks b
                ON a.block_idx = b.block_idx AND a.block_val = b.block_val
               AND a.doc_id < b.doc_id)
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(substr(da.text, 1, 64), substr(db.text, 1, 64))
                AS INTEGER) AS head_edit_dist
    FROM (SELECT doc_a, doc_b FROM pairs WHERE hamming <= 3) p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
    """,
)
def dedup_pair_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein verification tier over SimHash candidate pairs —
    cheap-filter → expensive-verify composition with a string metric
    (dedup.simhash_pairs_editdist; per-pair cost capped at O(head²))."""
    return dedup.simhash_pairs_editdist(load_table(spark, sf_dir, "documents"))


TOP_NGRAMS_SQL = """
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    b AS (SELECT u.bg AS ngram
          FROM w, UNNEST(CASE WHEN len(ws) >= 2
                              THEN list_transform(range(1, len(ws)),
                                                  i -> ws[i] || ' ' || ws[i + 1])
                              ELSE CAST([] AS VARCHAR[]) END) AS u(bg))
    SELECT ngram, COUNT(*) AS occurrences
    FROM b GROUP BY ngram
    ORDER BY occurrences DESC, ngram ASC LIMIT 20
"""


@register("text_ngram_topk", TOP_NGRAMS_SQL)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams (text.top_ngrams) — map-side-combined
    aggregation + TakeOrderedAndProject, vocabulary-bounded shuffle."""
    return text.top_ngrams(load_table(spark, sf_dir, "documents"), n=2, k=20)


@register("sql_customer_distribution", sql_surface.CUSTOMER_DISTRIBUTION_SQL)
def sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation
    (sql.customer_distribution)."""
    return sql_surface.customer_distribution(spark, sf_dir)


@register("sql_returned_revenue", sql_surface.RETURNED_REVENUE_SQL)
def sql_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: pushed-down returnflag filter, broadcast
    nation, exact-decimal revenue, top-20 via TakeOrderedAndProject
    (sql.returned_revenue)."""
    return sql_surface.returned_revenue(spark, sf_dir)


FIRST_TOUCH_SQL = """
    SELECT user_id, event_type, us AS first_ts_us, event_id AS first_event_id
    FROM (
        SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS rn
        FROM events WHERE user_id IS NOT NULL
    ) WHERE rn = 1
"""


@register("events_first_touch", FIRST_TOUCH_SQL)
def events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest event per (user, event_type) via one min-struct
    aggregation — sessions.first_touch, the batch oracle of the
    streaming dedup twin."""
    return sessions.first_touch(load_table(spark, sf_dir, "events"))


HEAVY_USERS_SQL = f"""
    WITH du AS ({DU_CORE_SQL}),
    s AS (SELECT AVG(size_bytes) AS a, SUM(size_bytes) AS t FROM du)
    SELECT address, size_bytes, number_files,
           ROUND(size_bytes / t, 4) AS share_of_total,
           ROUND(size_bytes / a, 2) AS avg_multiple
    FROM du, s WHERE size_bytes >= 3.0 * a
"""


@register("du_heavy_users", HEAVY_USERS_SQL)
def du_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Addresses ≥3× the average usage with share-of-total — broadcast
    scalar comparison, no sort/window (core.heavy_users)."""
    inv = core.inventory_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    return core.heavy_users(core.disk_usage(inv), 3.0)


COHORT_RETENTION_SQL = """
    WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                FROM events WHERE user_id IS NOT NULL),
    f AS (SELECT user_id, MIN(d) AS cohort_d FROM ud GROUP BY user_id)
    SELECT strftime(f.cohort_d, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort_d, ud.d) AS INTEGER) AS day_offset,
           COUNT(*) AS active_users
    FROM ud JOIN f ON ud.user_id = f.user_id
    GROUP BY cohort_day, day_offset
"""


@register("events_retention_cohorts", COHORT_RETENTION_SQL)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix over distinct (user, day) pairs —
    sessions.cohort_retention."""
    return sessions.cohort_retention(load_table(spark, sf_dir, "events"))


TFIDF_SQL = """
    WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                   FROM documents),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words
           GROUP BY doc_id, word),
    dft AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (SELECT doc_id, tf.word AS term,
                      ROUND(tf * ln(n_docs * 1.0 / df), 4) AS tfidf
               FROM tf JOIN dft ON tf.word = dft.word, n)
    SELECT doc_id, term, tfidf,
           CAST(rk AS INTEGER) AS term_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term ASC) AS rk FROM scored)
    WHERE rk <= 3
"""


@register("text_tfidf_topterms", TFIDF_SQL)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — text.tfidf_top_terms
    (vocabulary-bounded aggregations + broadcast corpus-size
    scalar)."""
    return text.tfidf_top_terms(load_table(spark, sf_dir, "documents"))


SPEND_TREND_SQL = """
    WITH s AS (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               SUM(date_diff('day', DATE '1992-01-01',
                             CAST(o_orderdate AS DATE))) AS sx,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sy,
               SUM(CAST(date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE))
                        AS DECIMAL(12,0))
                   * CAST(o_totalprice AS DECIMAL(12,2))) AS sxy,
               SUM(CAST(date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT)
                   * CAST(date_diff('day', DATE '1992-01-01',
                                    CAST(o_orderdate AS DATE)) AS BIGINT))
                   AS sxx
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders,
           ROUND(CAST(n_orders * sxy - sx * sy AS DOUBLE)
                 / CAST(n_orders * sxx - sx * sx AS DOUBLE), 6) AS spend_slope
    FROM s
    WHERE n_orders >= 5 AND CAST(n_orders * sxx - sx * sx AS DOUBLE) != 0
"""


@register("trend_customer_spend", SPEND_TREND_SQL)
def trend_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares spend slope per customer from one pass of exact
    sufficient statistics (relational.customer_spend_trend)."""
    return relational.customer_spend_trend(load_table(spark, sf_dir, "orders"))


PART_AFFINITY_SQL = """
    WITH ot AS (
        SELECT DISTINCT l_orderkey, p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.p_type AS type_a, b.p_type AS type_b, COUNT(*) AS n_orders
    FROM ot a JOIN ot b
      ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
    GROUP BY type_a, type_b
    ORDER BY n_orders DESC, type_a ASC, type_b ASC
    LIMIT 20
"""


@register("part_type_affinity", PART_AFFINITY_SQL)
def part_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-ordered part-type pairs — order-bounded self-join
    (relational.part_type_affinity)."""
    return relational.part_type_affinity(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


NGRAM_CONTAINMENT_SQL = f"""
    WITH {_CAPPED_SHINGLE_CTES},
    inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS i
              FROM shingles x JOIN shingles y
                ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY doc_a, doc_b),
    j AS (SELECT doc_a, doc_b, i, za.n AS na, zb.n AS nb
          FROM inter
          JOIN sizes za ON doc_a = za.doc_id
          JOIN sizes zb ON doc_b = zb.doc_id)
    SELECT doc_src, doc_dst, ROUND(c, 4) AS containment FROM (
        SELECT doc_a AS doc_src, doc_b AS doc_dst, i * 1.0 / na AS c FROM j
        UNION ALL
        SELECT doc_b AS doc_src, doc_a AS doc_dst, i * 1.0 / nb AS c FROM j
    ) WHERE c >= 0.8
"""


@register("dedup_ngram_containment", NGRAM_CONTAINMENT_SQL)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment ≥ 0.8 over the df-capped shingle
    join — dedup.ngram_containment_pairs (asymmetric near-dup:
    fragment-inside-document)."""
    return dedup.ngram_containment_pairs(load_table(spark, sf_dir, "documents"))


@register("sql_sales_opportunity", sql_surface.GLOBAL_SALES_OPPORTUNITY_SQL)
def sql_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-AVG subquery (1-row broadcast) + NOT
    EXISTS → left anti join (sql.global_sales_opportunity)."""
    return sql_surface.global_sales_opportunity(spark, sf_dir)


@register("sql_shipping_modes", sql_surface.SHIPPING_MODES_SQL)
def sql_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation — both CASE counters
    from ONE pass (sql.shipping_modes)."""
    return sql_surface.shipping_modes(spark, sf_dir)


@register("sql_promo_revenue", sql_surface.PROMO_REVENUE_SQL)
def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional exact-decimal sums, one
    double division (sql.promo_revenue)."""
    return sql_surface.promo_revenue(spark, sf_dir)


SEGMENT_SPEND_RANKS_SQL = """
    WITH spend AS (
        SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey AS custkey,
           c_mktsegment AS segment,
           total_spend,
           CAST(NTILE(10) OVER w AS INTEGER) AS spend_decile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM spend JOIN customer ON o_custkey = c_custkey
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY total_spend DESC, c_custkey ASC)
"""


@register("window_segment_deciles", SEGMENT_SPEND_RANKS_SQL)
def window_segment_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE/PERCENT_RANK/CUME_DIST over a PARTITIONED window of
    per-customer aggregates (relational.segment_spend_ranks)."""
    return relational.segment_spend_ranks(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


RRF_HYBRID_SQL = f"""
    WITH {_CAPPED_SHINGLE_CTES},
    inter AS (SELECT q.doc_id AS query_id, c.doc_id AS cand_id,
                     COUNT(*) AS i
              FROM shingles c
              JOIN shingles q ON c.shingle = q.shingle
                             AND c.doc_id != q.doc_id
              WHERE q.doc_id < 4
              GROUP BY query_id, cand_id),
    jac AS (SELECT query_id, cand_id,
                   i * 1.0 / (zq.n + zc.n - i) AS jaccard
            FROM inter
            JOIN sizes zq ON query_id = zq.doc_id
            JOIN sizes zc ON cand_id = zc.doc_id),
    t AS (SELECT query_id, cand_id, rank_t FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY jaccard DESC, cand_id ASC) AS rank_t
              FROM jac) WHERE rank_t <= {similarity.RRF_POOL}),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb
          FROM embeddings WHERE vec_id < 4),
    vscored AS (SELECT query_id, e.vec_id AS cand_id,
                       ROUND({_ddb_cosine('q_emb', 'e.embedding')}, 6)
                           AS cos_sim
                FROM embeddings e, q WHERE e.vec_id != query_id),
    v AS (SELECT query_id, cand_id, rank_v FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, cand_id ASC) AS rank_v
              FROM vscored) WHERE rank_v <= {similarity.RRF_POOL}),
    fused AS (SELECT COALESCE(t.query_id, v.query_id) AS query_id,
                     COALESCE(t.cand_id, v.cand_id) AS cand_id,
                     COALESCE(1.0 / ({similarity.RRF_K} + rank_t), 0)
                     + COALESCE(1.0 / ({similarity.RRF_K} + rank_v), 0)
                         AS rrf_score
              FROM t FULL OUTER JOIN v
                ON t.query_id = v.query_id AND t.cand_id = v.cand_id)
    SELECT query_id, cand_id, rrf_score,
           CAST(fr AS INTEGER) AS fused_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rrf_score DESC, cand_id ASC) AS fr
          FROM fused) WHERE fr <= {similarity.RRF_TOPK}
"""


@register("sim_rrf_hybrid_topk", RRF_HYBRID_SQL)
def sim_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by reciprocal rank —
    similarity.rrf_hybrid_topk (query-bounded probe sides, FULL OUTER
    fusion of two pool-sized rank lists)."""
    return similarity.rrf_hybrid_topk(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )


def _mmr_oracle_sql(k: int, shortlist: int) -> str:
    """Generate the MMR greedy as chained CTEs: step s scores every
    unselected candidate as 0.7*rel - (1 - 0.7)*MAX(sim to selected)
    and picks the arg-max.  (1 - CAST(0.7 AS DOUBLE)), not 0.3: DuckDB
    parses bare decimal literals as DECIMAL (exact 0.3) and the engine computes
    ``1.0 - lam`` in IEEE doubles and 0.3 is a DIFFERENT double —
    writing the same expression keeps scores bit-identical, so the
    arg-max can never diverge on a near-tie."""
    steps = []
    for s in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, s))
        steps.append(f"""
    sc{s} AS (
        SELECT c.query_id, c.neighbor_id,
               CAST(0.7 AS DOUBLE) * c.rel - (1 - CAST(0.7 AS DOUBLE)) * MAX(p.sim) AS mmr_score
        FROM cand c
        JOIN ({prev}) sel ON sel.query_id = c.query_id
        JOIN psim p ON p.query_id = c.query_id
             AND p.i = c.neighbor_id AND p.j = sel.neighbor_id
        WHERE c.neighbor_id NOT IN
              (SELECT neighbor_id FROM ({prev}) x
               WHERE x.query_id = c.query_id)
        GROUP BY c.query_id, c.neighbor_id, c.rel
    ),
    sel{s} AS (
        SELECT query_id, neighbor_id, mmr_score, {s} AS mmr_rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY mmr_score DESC, neighbor_id ASC) AS rn
            FROM sc{s}) WHERE rn = 1
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, k + 1))
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 8),
    scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ROUND({_ddb_cosine('q_emb', 'e.embedding')}, 6) AS rel
        FROM embeddings e, q WHERE e.vec_id != query_id
    ),
    cand AS (SELECT query_id, neighbor_id, rel FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rel DESC, neighbor_id ASC) AS rn
                 FROM scored) WHERE rn <= {shortlist}),
    psim AS (
        SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
               ROUND({_ddb_cosine('ea.embedding', 'eb.embedding')}, 6) AS sim
        FROM cand a
        JOIN cand b ON a.query_id = b.query_id
             AND a.neighbor_id != b.neighbor_id
        JOIN embeddings ea ON ea.vec_id = a.neighbor_id
        JOIN embeddings eb ON eb.vec_id = b.neighbor_id
    ),
    sel1 AS (
        SELECT query_id, neighbor_id, CAST(0.7 AS DOUBLE) * rel AS mmr_score, 1 AS mmr_rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY CAST(0.7 AS DOUBLE) * rel DESC, neighbor_id ASC) AS rn
              FROM cand) WHERE rn = 1
    ),{','.join(steps)}
    SELECT query_id, neighbor_id, CAST(mmr_rank AS INTEGER) AS mmr_rank,
           mmr_score
    FROM ({union})
"""


@register(
    "sim_mmr_topk",
    _mmr_oracle_sql(similarity.MMR_K, similarity.MMR_SHORTLIST),
)
def sim_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k over the exact
    shortlist tier — similarity.mmr_rerank_topk (greedy runs per query
    over a bounded shortlist; all vector math stays JVM-side)."""
    return similarity.mmr_rerank_topk(load_table(spark, sf_dir, "embeddings"))


