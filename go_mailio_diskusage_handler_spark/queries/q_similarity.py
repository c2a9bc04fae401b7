"""Similarity search over embeddings (brute-force + LSH ANN).

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from ._base import register


# ---------------------------------------------------------------------------
# [EXT] Similarity search over embeddings (brute-force + LSH ANN)
# ---------------------------------------------------------------------------
from ..operators import similarity  # noqa: E402


def _ddb_dot(a: str, b: str) -> str:
    # Native list_dot_product on DOUBLE[] — bit-identical to the former
    # list_sum(list_transform(range, i -> a[i]*b[i])) form (A/B-checked
    # at max-abs-diff 0.0 over all sf0.1 self/cross/plane dots, round
    # 10) but ~100x faster: the interpreted per-element lambda made the
    # similarity oracles the slowest in the registry (the
    # dedup_embedding_cosine DuckDB twin alone was 48 s at sf0.1).
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def _ddb_cosine(a: str, b: str) -> str:
    return (
        f"({_ddb_dot(a, b)} / (sqrt({_ddb_dot(a, a)}) * sqrt({_ddb_dot(b, b)})))"
    )


def _ddb_bucket(col: str, table: int = 0) -> str:
    terms = []
    for p in range(similarity.N_PLANES):
        plane = "[" + ", ".join(
            str(int(w))
            for w in similarity.hyperplane(table * similarity.N_PLANES + p)
        ) + "]"
        d = _ddb_dot(col, plane)
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


@register(
    "sim_brute_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 8),
    scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ROUND({_ddb_cosine('q_emb', 'e.embedding')}, 6) AS cos_sim
        FROM embeddings e, q WHERE e.vec_id != query_id
    ),
    ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10
    """,
)
def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(load_table(spark, sf_dir, "embeddings"), 8, 10)


@register(
    "sim_filtered_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, label AS q_label, embedding AS q_emb
               FROM embeddings WHERE vec_id < 8),
    scored AS (
        SELECT query_id, e.vec_id AS neighbor_id, e.label AS label,
               ROUND({_ddb_cosine('q_emb', 'e.embedding')}, 6) AS cos_sim
        FROM embeddings e JOIN q
          ON e.label = q_label AND e.vec_id != query_id
    ),
    ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, label, cos_sim, rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: exact top-k within the query's
    label class (similarity.filtered_topk) — the filter is a join key,
    not a post-filter, so off-class vectors are never scored."""
    return similarity.filtered_topk(load_table(spark, sf_dir, "embeddings"), 8, 5)


@register(
    "sim_lsh_buckets",
    f"""
    SELECT vec_id, {_ddb_bucket('embedding')} AS bucket FROM embeddings
    """,
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_buckets(load_table(spark, sf_dir, "embeddings"))


_DDB_TBUCKET = "CASE " + " ".join(
    f"WHEN t = {t} THEN b{t}" for t in range(similarity.N_TABLES)
) + " END"

_ANN_TABLES = len(similarity.PROBE_MASKS_BY_TABLE)
_DDB_ANN_TBUCKET = "CASE " + " ".join(
    f"WHEN t = {t} THEN b{t}" for t in range(_ANN_TABLES)
) + " END"

@register(
    "sim_lsh_ann_topk",
    f"""
    WITH withb AS (SELECT vec_id, embedding,
                          {", ".join(f"{_ddb_bucket('embedding', t)} AS b{t}"
                                     for t in range(_ANN_TABLES))}
                   FROM embeddings),
    tm AS (SELECT * FROM (VALUES {", ".join(
        f"({t}, {m})"
        for t in range(_ANN_TABLES)
        for m in similarity.PROBE_MASKS_BY_TABLE[t]
    )}) AS tm(t, mask)),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, t,
                 xor({_DDB_ANN_TBUCKET}, CAST(mask AS INTEGER)) AS q_bucket
          FROM withb CROSS JOIN tm WHERE vec_id < 8),
    scored AS (
        SELECT DISTINCT query_id, e.vec_id AS neighbor_id,
               ROUND({_ddb_cosine('q_emb', 'e.embedding')}, 6) AS cos_sim
        FROM withb e JOIN q
          ON (CASE {" ".join(f"WHEN q.t = {t} THEN e.b{t}"
                             for t in range(_ANN_TABLES))} END) = q_bucket
         AND e.vec_id != query_id
    ),
    ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_ann_topk(load_table(spark, sf_dir, "embeddings"), 8, 5)


@register(
    "dedup_embedding_cosine",
    # Candidate pairs are DISTINCT-ed BEFORE any cosine math (round-9
    # verdict: the old form evaluated the O(dim) cosine expression
    # twice per (table, mask)-duplicated joined row, making this the
    # slowest oracle in the registry — 48 s at sf0.1).  Same bucket
    # recipe, same pairs, same threshold, same output contract; the
    # cosine now runs exactly once per distinct candidate pair.
    f"""
    WITH withb AS (SELECT vec_id,
                          {", ".join(f"{_ddb_bucket('embedding', t)} AS b{t}"
                                     for t in range(similarity.N_TABLES))}
                   FROM embeddings),
    ms AS (SELECT unnest([{", ".join(str(m) for m in similarity.PROBE_MASKS_H1)}])
               AS mask),
    ts AS (SELECT unnest(range({similarity.N_TABLES})) AS t),
    probed AS (SELECT vec_id, t,
                      xor({_DDB_TBUCKET}, CAST(mask AS INTEGER)) AS probe_bucket
               FROM withb CROSS JOIN ts CROSS JOIN ms),
    cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
             FROM probed a JOIN withb b
               ON (CASE {" ".join(f"WHEN a.t = {t} THEN b.b{t}"
                                  for t in range(similarity.N_TABLES))} END)
                  = a.probe_bucket
              AND a.vec_id < b.vec_id),
    scored AS (SELECT c.vec_a, c.vec_b,
                      ROUND({_ddb_cosine('ea.embedding', 'eb.embedding')}, 6)
                          AS cos_sim
               FROM cand c
               JOIN embeddings ea ON ea.vec_id = c.vec_a
               JOIN embeddings eb ON eb.vec_id = c.vec_b)
    SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), 0.4
    )


