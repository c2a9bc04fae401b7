"""Python UDF surface: scalar pandas_udf, grouped-agg pandas_udf.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import core
from ..sources.tables import load_table
from ._base import register
from .q_du import INVENTORY_SQL
from .q_similarity import _ddb_cosine


# ---------------------------------------------------------------------------
# [EXT] Python UDF surface: scalar pandas_udf, grouped-agg pandas_udf
# (UDAF), Python UDTF (SURVEY §2.1 UDF row)
# ---------------------------------------------------------------------------
from ..functions import udfs  # noqa: E402


@register(
    "udf_pandas_cosine",
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND({_ddb_cosine('e.embedding', 'q_emb')}, 4) AS cos_to_q0
    FROM embeddings e, q WHERE e.vec_id != 0
    """,
)
def udf_pandas_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar Pandas UDF (vectorized numpy cosine);
    4-digit rounding absorbs numpy-pairwise vs sequential-fold fp
    summation differences."""
    return udfs.cosine_vs_first_vector(load_table(spark, sf_dir, "embeddings"))


@register(
    "udaf_weighted_avg_price",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return udfs.weighted_avg_price_per_flag(load_table(spark, sf_dir, "lineitem"))


@register(
    "udtf_path_segments",
    f"""
    WITH inv AS ({INVENTORY_SQL}),
    keys AS (SELECT key FROM inv ORDER BY key LIMIT 100),
    t AS (SELECT key, string_split(key, '/') AS parts FROM keys)
    SELECT key, CAST(u.i - 1 AS INTEGER) AS pos,
           parts[CAST(u.i AS INTEGER)] AS piece
    FROM t, UNNEST(range(1, len(parts) + 1)) AS u(i)
    """,
)
def udtf_path_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF under a lateral join over the synthesized inventory
    keys (bounded deterministic subset)."""
    inv = core.inventory_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    return udfs.path_segments(inv, 100)


_HEX3 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(word), {k + 1}, 1)) - 1) * {16 ** (2 - k)}"
    for k in range(3)
)

MODEL_SCORES_SQL = f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents),
    v AS (SELECT doc_id, ({_HEX3}) % 1000 AS val FROM w),
    s AS (SELECT doc_id, CAST(SUM(val) AS BIGINT) AS model_sum,
                 CAST(COUNT(*) AS INTEGER) AS n_tok
          FROM v GROUP BY doc_id)
    SELECT doc_id, model_sum, n_tok,
           ROUND(model_sum * 1.0 / n_tok, 4) AS model_score
    FROM s
"""


@register("udf_iter_model_scores", MODEL_SCORES_SQL)
def udf_iter_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas_udf: fake model loads once per worker,
    Arrow batches stream through — udfs.model_scores."""
    return udfs.model_scores(load_table(spark, sf_dir, "documents"))


