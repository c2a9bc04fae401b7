"""Data-quality gate (O9), skew-salted aggregation, IVF/PQ ANN stack.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import core, relational
from ..sources.tables import load_table
from ._base import register
from ..operators import multimodal, sessions  # noqa: E402
from ..functions import udfs  # noqa: E402
from .q_similarity import _ddb_cosine
from ..operators import similarity  # noqa: E402
from .q_du import INVENTORY_SQL


# ---------------------------------------------------------------------------
# [EXT] Data-quality gate (O9), skew-salted aggregation, IVF ANN
# ---------------------------------------------------------------------------


@register(
    "du_quality_check",
    f"""
    WITH inventory AS ({INVENTORY_SQL})
    SELECT COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN key IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
           CAST(SUM(CASE WHEN size IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_sizes,
           CAST(SUM(CASE WHEN NOT (len(string_split(key, '/')) >= 2) THEN 1 ELSE 0 END)
                AS BIGINT) AS malformed_keys
    FROM inventory
    """,
)
def du_quality_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference O9 (handler.go:224-228) re-expressed as a one-pass
    null/malformed accounting gate."""
    inv = core.inventory_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    return core.inventory_quality(inv)


@register(
    "salted_event_totals",
    """
    SELECT event_type,
           COUNT(*) AS event_count,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over the skewed event_type key —
    result identical to the direct GROUP BY (the oracle)."""
    return relational.salted_event_totals(load_table(spark, sf_dir, "events"))


_IVF_ASSIGN_CTES = f"""
    c AS (SELECT vec_id AS cid, embedding AS cemb
          FROM embeddings WHERE vec_id < {similarity.N_CENTROIDS}),
    cscored AS (SELECT e.vec_id, c.cid,
                       ROUND({_ddb_cosine('e.embedding', 'c.cemb')}, 6) AS cs
                FROM embeddings e CROSS JOIN c),
    cranked AS (SELECT vec_id, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
                FROM cscored),
    assign AS (SELECT vec_id, CAST(cid AS INTEGER) AS list_id
               FROM cranked WHERE rn = 1)
"""


@register(
    "sim_ivf_assignments",
    f"WITH {_IVF_ASSIGN_CTES} SELECT vec_id, list_id FROM assign",
)
def sim_ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization with a deterministic codebook (first
    N_CENTROIDS vectors) — the data-distribution-following counterpart
    to the hyperplane LSH buckets."""
    return similarity.ivf_assignments(load_table(spark, sf_dir, "embeddings"))


@register(
    "sim_ivf_ann_topk",
    f"""
    WITH {_IVF_ASSIGN_CTES},
    probes AS (SELECT vec_id AS query_id, CAST(cid AS INTEGER) AS list_id
               FROM cranked
               WHERE vec_id < 8 AND rn <= {similarity.N_PROBE}),
    cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
             FROM probes p JOIN assign a
               ON a.list_id = p.list_id AND a.vec_id != p.query_id),
    scored AS (SELECT query_id, neighbor_id,
                      ROUND({_ddb_cosine('q.embedding', 'n.embedding')}, 6) AS cos_sim
               FROM cand
               JOIN embeddings q ON q.vec_id = query_id
               JOIN embeddings n ON n.vec_id = neighbor_id),
    ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
)
def sim_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: probe the 2 nearest inverted lists per query,
    exact cosine rerank within candidates."""
    return similarity.ivf_ann_topk(load_table(spark, sf_dir, "embeddings"), 8, 5)


@register(
    "sim_quantize_int8",
    """
    SELECT vec_id, scale, array_to_string(qvec, ',') AS qvec_csv
    FROM (
        SELECT vec_id,
               ROUND(CASE WHEN am = 0 THEN 0.0 ELSE am / 127.0 END, 6) AS scale,
               CASE WHEN am = 0
                    THEN list_transform(embedding, x -> 0)
                    ELSE list_transform(embedding,
                        x -> CAST(floor(x / (am / 127.0) + 0.5) AS INTEGER))
               END AS qvec
        FROM (SELECT vec_id, embedding,
                     list_max(list_transform(embedding, y -> abs(y))) AS am
              FROM embeddings) b) q
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (4× storage shrink;
    portable floor(x/scale + 0.5) rounding).  The driver-facing
    projection serializes the int vector to CSV — every element is
    value-checked while the result schema stays scalar-typed."""
    from pyspark.sql import functions as F

    q = similarity.quantize_embeddings_int8(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(F.col("qvec"), lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
    )


@register(
    "sim_pq_codes",
    f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cemb
               FROM embeddings WHERE vec_id < {similarity.PQ_K}),
    ms AS (SELECT unnest(range({similarity.PQ_M})) AS m),
    sub AS (SELECT e.vec_id, ms.m, c.cid,
                   ROUND(list_sum(list_transform(range(1, {similarity.PQ_SUB + 1}),
                       i -> (CAST(e.embedding[ms.m * {similarity.PQ_SUB} + i] AS DOUBLE)
                             - CAST(c.cemb[ms.m * {similarity.PQ_SUB} + i] AS DOUBLE)) ^ 2)),
                         6) AS d2
            FROM embeddings e CROSS JOIN c CROSS JOIN ms),
    ranked AS (SELECT vec_id, m, cid,
                      ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                         ORDER BY d2 ASC, cid ASC) AS rn
               FROM sub)
    SELECT vec_id, CAST(m AS INTEGER) AS subspace, CAST(cid AS INTEGER) AS code
    FROM ranked WHERE rn = 1
    """,
)
def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (8 subspaces × 16 centroids —
    similarity.pq_codes): the 64× vector-compression leg of the
    storage tier."""
    return similarity.pq_codes(load_table(spark, sf_dir, "embeddings"))


_PQ_SUBDIST = (
    f"ROUND(list_sum(list_transform(range(1, {similarity.PQ_SUB + 1}), "
    f"i -> (CAST({{a}}[{{m}} * {similarity.PQ_SUB} + i] AS DOUBLE) "
    f"- CAST({{b}}[{{m}} * {similarity.PQ_SUB} + i] AS DOUBLE)) ^ 2)), 6)"
)


@register(
    "sim_pq_ann_topk",
    f"""
    WITH c AS (SELECT vec_id AS cid, embedding AS cemb
               FROM embeddings WHERE vec_id < {similarity.PQ_K}),
    ms AS (SELECT unnest(range({similarity.PQ_M})) AS m),
    sub AS (SELECT e.vec_id, ms.m, c.cid,
                   {_PQ_SUBDIST.format(a='e.embedding', b='c.cemb', m='ms.m')} AS d2
            FROM embeddings e CROSS JOIN c CROSS JOIN ms),
    codes AS (SELECT vec_id, m, cid AS code FROM (
                  SELECT vec_id, m, cid, ROW_NUMBER() OVER (
                      PARTITION BY vec_id, m ORDER BY d2 ASC, cid ASC) AS rn
                  FROM sub) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qemb
          FROM embeddings WHERE vec_id < 8),
    dt AS (SELECT q.query_id, ms.m, c.cid,
                  {_PQ_SUBDIST.format(a='q.qemb', b='c.cemb', m='ms.m')} AS d
           FROM q CROSS JOIN c CROSS JOIN ms),
    approx AS (SELECT dt.query_id, codes.vec_id AS neighbor_id,
                      ROUND(SUM(dt.d), 4) AS approx_dist
               FROM codes JOIN dt ON dt.m = codes.m AND dt.cid = codes.code
               WHERE codes.vec_id != dt.query_id
               GROUP BY dt.query_id, codes.vec_id),
    ranked AS (SELECT query_id, neighbor_id, approx_dist, ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY approx_dist ASC, neighbor_id ASC) AS rank
               FROM approx)
    SELECT query_id, neighbor_id, approx_dist, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN by asymmetric distance: per-query distance tables over
    the codebook, lookups against 4-byte codes
    (similarity.pq_ann_topk)."""
    return similarity.pq_ann_topk(load_table(spark, sf_dir, "embeddings"))


@register(
    "sim_ivfpq_ann_topk",
    f"""
    WITH {_IVF_ASSIGN_CTES},
    probes AS (SELECT vec_id AS query_id, CAST(cid AS INTEGER) AS list_id
               FROM cranked
               WHERE vec_id < 8 AND rn <= {similarity.N_PROBE}),
    pc AS (SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings WHERE vec_id < {similarity.PQ_K}),
    ms AS (SELECT unnest(range({similarity.PQ_M})) AS m),
    psub AS (SELECT e.vec_id, ms.m, pc.cid,
                    {_PQ_SUBDIST.format(a='e.embedding', b='pc.cemb', m='ms.m')} AS d2
             FROM embeddings e CROSS JOIN pc CROSS JOIN ms),
    codes AS (SELECT vec_id, m, cid AS code FROM (
                  SELECT vec_id, m, cid, ROW_NUMBER() OVER (
                      PARTITION BY vec_id, m ORDER BY d2 ASC, cid ASC) AS rn
                  FROM psub) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qemb
          FROM embeddings WHERE vec_id < 8),
    dt AS (SELECT q.query_id, ms.m, pc.cid,
                  {_PQ_SUBDIST.format(a='q.qemb', b='pc.cemb', m='ms.m')} AS d
           FROM q CROSS JOIN pc CROSS JOIN ms),
    cand AS (SELECT p.query_id, a.vec_id
             FROM probes p JOIN assign a
               ON a.list_id = p.list_id AND a.vec_id != p.query_id),
    approx AS (SELECT dt.query_id, codes.vec_id AS neighbor_id,
                      ROUND(SUM(dt.d), 4) AS approx_dist
               FROM cand
               JOIN codes ON codes.vec_id = cand.vec_id
               JOIN dt ON dt.query_id = cand.query_id
                      AND dt.m = codes.m AND dt.cid = codes.code
               GROUP BY dt.query_id, codes.vec_id),
    ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY approx_dist ASC, neighbor_id ASC) AS INTEGER) AS rank
               FROM approx)
    SELECT query_id, neighbor_id, approx_dist, rank FROM ranked WHERE rank <= 5
    """,
)
def sim_ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe pruning × PQ ADC scoring — the production ANN stack
    (similarity.ivfpq_ann_topk)."""
    return similarity.ivfpq_ann_topk(load_table(spark, sf_dir, "embeddings"))


@register(
    "sim_ivfpq_rerank_topk",
    f"""
    WITH {_IVF_ASSIGN_CTES},
    probes AS (SELECT vec_id AS query_id, CAST(cid AS INTEGER) AS list_id
               FROM cranked
               WHERE vec_id < 8 AND rn <= {similarity.N_PROBE}),
    pc AS (SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings WHERE vec_id < {similarity.PQ_K}),
    ms AS (SELECT unnest(range({similarity.PQ_M})) AS m),
    psub AS (SELECT e.vec_id, ms.m, pc.cid,
                    {_PQ_SUBDIST.format(a='e.embedding', b='pc.cemb', m='ms.m')} AS d2
             FROM embeddings e CROSS JOIN pc CROSS JOIN ms),
    codes AS (SELECT vec_id, m, cid AS code FROM (
                  SELECT vec_id, m, cid, ROW_NUMBER() OVER (
                      PARTITION BY vec_id, m ORDER BY d2 ASC, cid ASC) AS rn
                  FROM psub) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qemb
          FROM embeddings WHERE vec_id < 8),
    dt AS (SELECT q.query_id, ms.m, pc.cid,
                  {_PQ_SUBDIST.format(a='q.qemb', b='pc.cemb', m='ms.m')} AS d
           FROM q CROSS JOIN pc CROSS JOIN ms),
    cand AS (SELECT p.query_id, a.vec_id
             FROM probes p JOIN assign a
               ON a.list_id = p.list_id AND a.vec_id != p.query_id),
    approx AS (SELECT dt.query_id, codes.vec_id AS neighbor_id,
                      ROUND(SUM(dt.d), 4) AS approx_dist
               FROM cand
               JOIN codes ON codes.vec_id = cand.vec_id
               JOIN dt ON dt.query_id = cand.query_id
                      AND dt.m = codes.m AND dt.cid = codes.code
               GROUP BY dt.query_id, codes.vec_id),
    short AS (SELECT query_id, neighbor_id FROM (
                  SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
                      PARTITION BY query_id
                      ORDER BY approx_dist ASC, neighbor_id ASC) AS srank
                  FROM approx) WHERE srank <= {similarity.RERANK_SHORTLIST}),
    exact AS (SELECT s.query_id, s.neighbor_id,
                     ROUND({_ddb_cosine('qe.embedding', 'ne.embedding')}, 6)
                         AS cos_sim
              FROM short s
              JOIN embeddings qe ON qe.vec_id = s.query_id
              JOIN embeddings ne ON ne.vec_id = s.neighbor_id),
    reranked AS (SELECT *, CAST(ROW_NUMBER() OVER (
                     PARTITION BY query_id
                     ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
                 FROM exact)
    SELECT query_id, neighbor_id, cos_sim, rank FROM reranked WHERE rank <= 5
    """,
)
def sim_ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×PQ ADC shortlist → exact cosine re-rank: the full
    production ANN output stage (similarity.ivfpq_rerank_topk)."""
    return similarity.ivfpq_rerank_topk(load_table(spark, sf_dir, "embeddings"))


@register(
    "semi_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE year(o_orderdate) = 1995)
    """,
)
def semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (existence check) — completes the semi/anti pair
    from SURVEY §2.1's join row."""
    return relational.customers_with_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        1995,
    )


_INV_SLICE_SQL = """SELECT CASE WHEN l_linenumber = 7 THEN CAST(l_orderkey AS VARCHAR)
                ELSE CAST(l_orderkey AS VARCHAR) || '/' || CAST(l_linenumber AS VARCHAR)
           END AS key,
           l_extendedprice AS size
    FROM lineitem WHERE {pred}"""


@register(
    "du_incremental",
    f"""
    WITH inventory AS ({_INV_SLICE_SQL.format(pred='l_linenumber >= 2')})
    SELECT split_part(key, '/', 1) AS address,
           ROUND(SUM(size), 2) AS size_bytes,
           COUNT(*) AS number_files
    FROM inventory
    WHERE len(string_split(key, '/')) >= 2
    GROUP BY address
    """,
)
def du_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot maintenance: yesterday's aggregate
    (linenumber <= 5 slice) + added objects (>= 6) - removed (= 1)
    must equal a full re-aggregation of today's snapshot (>= 2) —
    which is exactly what the oracle computes."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    prev = core.disk_usage(
        core.inventory_from_lineitem(li.filter(F.col("l_linenumber") <= 5)),
        round_to=None,
    )
    added = core.inventory_from_lineitem(li.filter(F.col("l_linenumber") >= 6))
    removed = core.inventory_from_lineitem(li.filter(F.col("l_linenumber") == 1))
    return core.incremental_disk_usage(prev, added, removed)


@register(
    "udf_grouped_map_zscore",
    """
    WITH s AS (SELECT user_id, event_id, value,
                      COUNT(*) OVER w AS n,
                      AVG(value) OVER w AS mu,
                      STDDEV_SAMP(value) OVER w AS sd
               FROM events WINDOW w AS (PARTITION BY user_id))
    SELECT user_id, event_id, ROUND((value - mu) / sd, 4) AS z_value
    FROM s WHERE n >= 2 AND sd > 0
    """,
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-scores (numpy two-pass vs
    the oracle's window stddev agree far inside the 4-digit round)."""
    return udfs.per_user_zscores(load_table(spark, sf_dir, "events"))


@register(
    "part_brand_stats",
    """
    SELECT p_brand,
           COUNT(*) AS part_count,
           ROUND(AVG(p_retailprice), 2) AS avg_retail,
           MIN(p_size) AS min_size,
           MAX(p_size) AS max_size
    FROM part GROUP BY p_brand
    """,
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate scan over the part dimension (min/max/avg in
    one pass)."""
    from pyspark.sql import functions as F

    return (
        load_table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("part_count"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_retail"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
    )


@register(
    "supplier_nation_balance",
    """
    SELECT n_name,
           COUNT(*) AS supplier_count,
           ROUND(SUM(s_acctbal), 2) AS total_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def supplier_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier facts ⋈ broadcast nation dim → per-nation totals."""
    from pyspark.sql import functions as F

    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("supplier_count"),
            F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "star_profit_by_nation_brand",
    """
    SELECT n_name, p_brand,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name, p_brand
    """,
)
def star_profit_by_nation_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimension star join over the big fact (TPC-H Q9 shape):
    lineitem ⋈ part ⋈ supplier ⋈ nation, every dimension broadcast —
    the fact table streams through with ZERO join shuffles; the only
    exchange is the final (n_name, p_brand) aggregation, collapsed by
    partial aggregation first."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name", "p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@register(
    "docs_source_stats",
    """
    SELECT source, lang,
           COUNT(*) AS doc_count,
           CAST(SUM(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_chars_consistent,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY source, lang
    """,
)
def docs_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus profile including a stored-vs-actual
    length consistency check — the metadata-validation pass a training
    pipeline runs before trusting catalog columns."""
    from pyspark.sql import functions as F

    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum(
                (F.col("n_chars") == F.length("text")).cast("long")
            ).alias("n_chars_consistent"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "segment_customer_value",
    """
    SELECT c_mktsegment,
           COUNT(*) AS customer_count,
           ROUND(AVG(c_acctbal), 2) AS avg_acctbal,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer GROUP BY c_mktsegment
    """,
)
def segment_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "setop_retained_customers",
    """
    SELECT o_custkey AS retained_custkey FROM orders WHERE o_orderdate < '1998-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= '1998-01-01'
    """,
)
def setop_retained_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (completing union/except/intersect): customers active
    in BOTH halves of the date range.  Spark plans this as a left-semi
    join over the two distinct sets — both sides shrink to distinct
    custkeys before the shuffle."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    before = orders.filter(F.col("o_orderdate") < "1998-01-01").select(
        F.col("o_custkey").alias("retained_custkey")
    )
    after = orders.filter(F.col("o_orderdate") >= "1998-01-01").select(
        F.col("o_custkey").alias("retained_custkey")
    )
    return before.intersect(after)


@register(
    "media_resize",
    """
    WITH m AS (SELECT doc_id,
                      ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)]
                          AS media_type,
                      octet_length(encode(text)) AS nb
               FROM documents),
    i AS (SELECT doc_id, media_type,
                 CAST(16 + nb % 625 AS INTEGER) AS width,
                 CAST(16 + (nb * 7) % 475 AS INTEGER) AS height
          FROM m WHERE media_type = 'image'),
    s AS (SELECT *, least(1.0, 128.0 / greatest(width, height)) AS scale FROM i)
    SELECT doc_id, media_type, width, height,
           CAST(greatest(1, floor(width * scale)) AS INTEGER) AS out_width,
           CAST(greatest(1, floor(height * scale)) AS INTEGER) AS out_height,
           CAST(trunc(scale * 100) AS INTEGER) AS scale_pct
    FROM s
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving thumbnail geometry over mapInPandas (the
    missing 'resize' stage of the multimodal quartet)."""
    return multimodal.resize_images(load_table(spark, sf_dir, "documents"), 128)


@register(
    "media_audio_chunks",
    """
    WITH a AS (SELECT doc_id,
                      CAST(floor(octet_length(encode(text)) / 2) AS BIGINT)
                          AS n_samples
               FROM documents WHERE doc_id % 3 = 1),
    c AS (SELECT doc_id, n_samples,
                 unnest(range(CAST(ceil(n_samples / 80.0) AS BIGINT))) AS chunk_idx
          FROM a WHERE n_samples > 0)
    SELECT doc_id, chunk_idx,
           chunk_idx * 80 AS start_sample,
           least(80, n_samples - chunk_idx * 80) AS chunk_samples
    FROM c
    """,
)
def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-duration audio chunk windows (multimodal.audio_chunks;
    5 ms at 16 kHz = 80-sample chunks so fixtures span several)."""
    return multimodal.audio_chunks(
        load_table(spark, sf_dir, "documents"), chunk_ms=5
    )


@register(
    "events_asof_join",
    """
    WITH e AS (SELECT user_id, event_id, ts, event_type, value, epoch_us(ts) AS us
               FROM events WHERE event_type IN ('click', 'purchase')),
    c AS (SELECT user_id, event_id, us AS ts_us, event_type,
                 last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS) OVER w AS raw_val,
                 last_value(CASE WHEN event_type = 'purchase' THEN us END
                            IGNORE NULLS) OVER w AS asof_ts_us
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id, ts_us,
           ROUND(raw_val, 4) AS asof_value, asof_ts_us
    FROM c WHERE event_type = 'click' AND raw_val IS NOT NULL
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join by composition: each click paired with the same
    user's most recent prior-or-simultaneous purchase (single window
    pass — no range join)."""
    return sessions.asof_last_purchase(load_table(spark, sf_dir, "events"))


@register(
    "events_attribution_join",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           ROUND(p.value, 4) AS purchase_value,
           c.event_id AS click_id,
           epoch_us(c.ts) AS click_ts_us
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def events_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join (purchase ⋈ preceding clicks within 30 min).
    Same expression runs as a bounded-state stream-stream join in
    streaming.windows.attributed_purchases; stream ≡ batch asserted in
    tests/test_streaming.py."""
    from pyspark.sql import functions as F

    from ..streaming import windows as streaming_windows

    df = streaming_windows.attributed_purchases(load_table(spark, sf_dir, "events"))
    return df.select(
        "purchase_id",
        "user_id",
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
        "click_id",
        F.unix_micros("click_ts").alias("click_ts_us"),
    )


