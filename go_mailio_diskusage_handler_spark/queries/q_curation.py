"""Training-data curation: splits / mixture / decontamination.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from ._base import register
from ..operators import dedup  # noqa: E402
from .q_dedup import _CAPPED_SHINGLE_CTES
from ..operators import curation  # noqa: E402


# ---------------------------------------------------------------------------
# [EXT] Training-data curation: splits / mixture / decontamination
# ---------------------------------------------------------------------------
_DDB_BUCKET = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), {k + 1}, 1)) - 1)"
    f" * {16 ** (3 - k)}"
    for k in range(4)
)


@register(
    "curation_split_assign",
    f"""
    SELECT doc_id,
           CAST({_DDB_BUCKET} AS BIGINT) AS bucket,
           CASE WHEN ({_DDB_BUCKET}) % 100 < {curation.TRAIN_PCT} THEN 'train'
                WHEN ({_DDB_BUCKET}) % 100 < {curation.TRAIN_PCT + curation.VAL_PCT}
                     THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def curation_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.split_assignments(load_table(spark, sf_dir, "documents"))


#: Mixture weights exercised by the sample_weighted query/oracle pair.
_SAMPLE_RATES = {"src0": 0.5, "src1": 0.25, "src2": 0.0}
_SAMPLE_DEFAULT = 0.9


@register(
    "curation_sample_weighted",
    f"""
    SELECT doc_id, source FROM documents
    WHERE ({_DDB_BUCKET}) / 65536.0 <
          CASE source WHEN 'src0' THEN 0.5
                      WHEN 'src1' THEN 0.25
                      WHEN 'src2' THEN 0.0
                      ELSE 0.9 END
    """,
)
def curation_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source Bernoulli sampling (mixture weights as
    probabilities; curation.sample_weighted)."""
    return curation.sample_weighted(
        load_table(spark, sf_dir, "documents"), _SAMPLE_RATES, _SAMPLE_DEFAULT
    )


@register(
    "curation_mixture",
    f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY ({_DDB_BUCKET}) ASC, doc_id ASC) AS rk
        FROM documents) q
    WHERE rk <= 10
    """,
)
def curation_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-ranked per-source caps WITH the round-5 skew guard on its
    default: the guard's bounded-histogram pre-filter adds ~0.5 s of
    fixed local overhead vs the bare window (the price that fences a
    10⁹-doc source at 100 TB — same accepted trade as the round-4
    shingle DF cap on curation_contaminated); output is provably
    identical, so the oracle is unchanged."""
    return curation.mixture_rebalance(load_table(spark, sf_dir, "documents"), 10)


@register(
    "curation_pack_sequences",
    """
    SELECT doc_id,
           source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(floor(COALESCE(SUM(len(string_split(text, ' '))) OVER (
                          PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      / 512.0)
                AS BIGINT) AS bin_id
    FROM documents
    """,
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing into 512-token bins
    (curation.pack_sequences)."""
    return curation.pack_sequences(load_table(spark, sf_dir, "documents"), 512)


@register(
    "curation_contaminated",
    f"""
    WITH {_CAPPED_SHINGLE_CTES},
    train AS (SELECT doc_id, shingle FROM shingles WHERE doc_id >= 200),
    ev AS (SELECT doc_id AS eval_doc_id, shingle FROM shingles WHERE doc_id < 200),
    overlap AS (SELECT t.doc_id, e.eval_doc_id, COUNT(*) AS n_overlap
                FROM train t JOIN ev e ON t.shingle = e.shingle
                GROUP BY 1, 2
                HAVING COUNT(*) >= 3)
    SELECT doc_id, MAX(n_overlap) AS max_overlap, COUNT(*) AS n_eval_docs
    FROM overlap GROUP BY doc_id
    """,
)
def curation_contaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.contaminated_docs(
        load_table(spark, sf_dir, "documents"),
        200,
        3,
        max_doc_freq=dedup.MAX_SHINGLE_DF,
    )


@register(
    "curation_corpus",
    f"""
    WITH RECURSIVE {_CAPPED_SHINGLE_CTES},
    qtoks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
    quality_ok AS (SELECT doc_id FROM qtoks
                   WHERE ROUND(len(list_distinct(t)) * 1.0 / len(t), 4) >= 0.4
                     AND len(t) >= 20),
    train AS (SELECT doc_id, shingle FROM shingles WHERE doc_id >= 200),
    ev AS (SELECT doc_id AS eval_doc_id, shingle FROM shingles WHERE doc_id < 200),
    contaminated AS (SELECT DISTINCT doc_id FROM (
        SELECT t.doc_id, e.eval_doc_id FROM train t JOIN ev e ON t.shingle = e.shingle
        GROUP BY 1, 2 HAVING COUNT(*) >= 3) c),
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM shingles x JOIN shingles y
               ON x.shingle = y.shingle AND x.doc_id < y.doc_id),
    inter AS (SELECT doc_a, doc_b, COUNT(*) AS i
              FROM cand
              JOIN shingles sa ON doc_a = sa.doc_id
              JOIN shingles sb ON doc_b = sb.doc_id AND sa.shingle = sb.shingle
              GROUP BY doc_a, doc_b),
    pairs AS (SELECT doc_a, doc_b FROM inter
              JOIN sizes za ON doc_a = za.doc_id
              JOIN sizes zb ON doc_b = zb.doc_id
              WHERE ROUND(i * 1.0 / (za.n + zb.n - i), 4) >= 0.6),
    edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a AS src, a AS dst FROM edges
              UNION
              SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    losers AS (SELECT src AS doc_id FROM reach GROUP BY src
               HAVING src != MIN(dst))
    SELECT d.doc_id, d.source,
           CASE WHEN ({_DDB_BUCKET.replace("cast(doc_id", "cast(d.doc_id")}) % 100
                     < {curation.TRAIN_PCT} THEN 'train'
                WHEN ({_DDB_BUCKET.replace("cast(doc_id", "cast(d.doc_id")}) % 100
                     < {curation.TRAIN_PCT + curation.VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents d
    JOIN quality_ok q ON d.doc_id = q.doc_id
    WHERE d.doc_id >= 200
      AND d.doc_id NOT IN (SELECT c.doc_id FROM contaminated c)
      AND d.doc_id NOT IN (SELECT l.doc_id FROM losers l)
    """,
)
def curation_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composite: quality gate → decontaminate → dedup-keep-one
    → split assignment, one declarative plan end-to-end."""
    return curation.curated_corpus(load_table(spark, sf_dir, "documents"))


#: Shared recursive-CTE chain ending in a ``clusters(doc_id,
#: cluster_id)`` CTE — used by dedup_clusters and the keep-best
#: composition.  ``edges AS MATERIALIZED``: DuckDB inlines CTEs
#: referenced from inside a WITH RECURSIVE scope, re-evaluating the
#: whole shingle->cand->inter->pairs chain EVERY iteration of the
#: transitive closure (measured 38.6 s at sf0.1; 13 s with the hint;
#: results A/B-identical — the hint is evaluation-only).
_CLUSTERS_CTES = f"""
    WITH RECURSIVE {_CAPPED_SHINGLE_CTES},
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM shingles x JOIN shingles y
               ON x.shingle = y.shingle AND x.doc_id < y.doc_id),
    inter AS (SELECT doc_a, doc_b, COUNT(*) AS i
              FROM cand
              JOIN shingles sa ON doc_a = sa.doc_id
              JOIN shingles sb ON doc_b = sb.doc_id AND sa.shingle = sb.shingle
              GROUP BY doc_a, doc_b),
    pairs AS (SELECT doc_a, doc_b FROM inter
              JOIN sizes za ON doc_a = za.doc_id
              JOIN sizes zb ON doc_b = zb.doc_id
              WHERE ROUND(i * 1.0 / (za.n + zb.n - i), 4) >= 0.6),
    edges AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (SELECT a AS src, a AS dst FROM edges
              UNION
              SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    clusters AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                 FROM reach GROUP BY src)
"""


@register(
    "dedup_clusters",
    f"{_CLUSTERS_CTES} SELECT doc_id, cluster_id FROM clusters",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component duplicate clusters (iterative label
    propagation vs the oracle's recursive-CTE transitive closure)."""
    return dedup.duplicate_clusters(load_table(spark, sf_dir, "documents"), 0.6)


_NIBBLES = ", ".join(
    f"strpos('0123456789abcdef', substr(md5(token), {k + 1}, 1)) - 1 AS v{k}"
    for k in range(dedup.SIMHASH_BITS // 4)
)
_BIT_SUMS = ", ".join(
    f"SUM(((v{i // 4} >> {3 - i % 4}) & 1) * 2 - 1) AS s{i}"
    for i in range(dedup.SIMHASH_BITS)
)
_PACK = " + ".join(
    f"(CASE WHEN s{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(dedup.SIMHASH_BITS)
)

_SIMHASH_CTES = f"""
    tok AS (SELECT doc_id, u.token
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 UNNEST(t) AS u(token)),
    nib AS (SELECT doc_id, {_NIBBLES} FROM tok),
    sums AS (SELECT doc_id, {_BIT_SUMS} FROM nib GROUP BY doc_id),
    sim AS (SELECT doc_id, CAST({_PACK} AS BIGINT) AS simhash FROM sums)
"""


@register(
    "dedup_simhash_values",
    f"WITH {_SIMHASH_CTES} SELECT doc_id, simhash FROM sim",
)
def dedup_simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_values(load_table(spark, sf_dir, "documents"))


_SIM_BLOCKS = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {m} AS block_idx,"
    f" (simhash >> {dedup.SIMHASH_BLOCK_BITS * m}) & {(1 << dedup.SIMHASH_BLOCK_BITS) - 1}"
    f" AS block_val FROM sim"
    for m in range(dedup.SIMHASH_BLOCKS)
)


@register(
    "dedup_simhash_pairs",
    f"""
    WITH {_SIMHASH_CTES},
    blocks AS ({_SIM_BLOCKS}),
    pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
              FROM blocks a JOIN blocks b
                ON a.block_idx = b.block_idx AND a.block_val = b.block_val
               AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_dedup_pairs(load_table(spark, sf_dir, "documents"), 3)


