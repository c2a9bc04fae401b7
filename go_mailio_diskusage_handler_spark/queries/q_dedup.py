"""LLM-pipeline: MinHash LSH / SimHash / n-gram Jaccard near-dup.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from ._base import register
from ..operators import dedup  # noqa: E402


# ---------------------------------------------------------------------------
# [EXT] LLM-pipeline: MinHash LSH / SimHash / n-gram Jaccard near-dup
# (oracle SQL generated to mirror the portable md5-based hashing exactly)
# ---------------------------------------------------------------------------
_SHINGLE_CTES = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
             WHERE len(string_split(text, ' ')) >= 3),
    shingles AS (SELECT DISTINCT doc_id, u.s AS shingle
                 FROM toks, UNNEST(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(s)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id)
"""

#: Same shingle pipeline with the document-frequency cap active —
#: mirrors dedup.cap_shingle_df for every query in the ngram-Jaccard
#: family (dedup_ngram_jaccard / dedup_clusters / curation_*).
_CAPPED_SHINGLE_CTES = f"""
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
             WHERE len(string_split(text, ' ')) >= 3),
    all_shingles AS (SELECT DISTINCT doc_id, u.s AS shingle
                 FROM toks, UNNEST(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(s)),
    shingles AS (SELECT a.doc_id, a.shingle FROM all_shingles a
                 JOIN (SELECT shingle FROM all_shingles GROUP BY shingle
                       HAVING COUNT(*) <= {dedup.MAX_SHINGLE_DF}) r
                   ON a.shingle = r.shingle),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id)
"""

_MINHASH_AGGS = ", ".join(
    f"min(md5('{j}:' || shingle)) AS h{j}" for j in range(dedup.N_HASHES)
)
_BAND_SELECTS = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band_idx, md5({key}) AS band_key FROM sig".format(
        b=b,
        key=" || '|' || ".join(
            f"h{j}" for j in range(b * dedup.BAND_ROWS, (b + 1) * dedup.BAND_ROWS)
        ),
    )
    for b in range(dedup.N_BANDS)
)

_JACCARD_TAIL = """
    inter AS (SELECT doc_a, doc_b, COUNT(*) AS i
              FROM cand
              JOIN shingles sa ON doc_a = sa.doc_id
              JOIN shingles sb ON doc_b = sb.doc_id AND sa.shingle = sb.shingle
              GROUP BY doc_a, doc_b)
    SELECT doc_a, doc_b,
           ROUND(i * 1.0 / (za.n + zb.n - i), 4) AS jaccard
    FROM inter
    JOIN sizes za ON doc_a = za.doc_id
    JOIN sizes zb ON doc_b = zb.doc_id
"""


@register(
    "dedup_minhash",
    f"""
    WITH {_SHINGLE_CTES},
    sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM shingles GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
    {_JACCARD_TAIL}
    WHERE ROUND(i * 1.0 / (za.n + zb.n - i), 4) >= 0.8
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_dedup_pairs(load_table(spark, sf_dir, "documents"), 0.8)


#: Incremental-dedup batch boundary: docs with id ≥ this are "today's
#: ingest", probed against the stored band index of the full corpus.
_INCR_BATCH_MIN = 400


@register(
    "dedup_incremental_minhash",
    f"""
    WITH {_SHINGLE_CTES},
    sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM shingles GROUP BY doc_id),
    bands AS ({_BAND_SELECTS}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id AND b.doc_id >= {_INCR_BATCH_MIN}),
    {_JACCARD_TAIL}
    WHERE ROUND(i * 1.0 / (za.n + zb.n - i), 4) >= 0.8
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day fuzzy dedup: only pairs involving a new-batch doc
    (dedup.incremental_minhash_pairs) — the band index of the existing
    corpus is probed, never re-self-joined."""
    return dedup.incremental_minhash_pairs(
        load_table(spark, sf_dir, "documents"), _INCR_BATCH_MIN, 0.8
    )


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_CAPPED_SHINGLE_CTES},
    cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
             FROM shingles x JOIN shingles y
               ON x.shingle = y.shingle AND x.doc_id < y.doc_id),
    {_JACCARD_TAIL}
    WHERE ROUND(i * 1.0 / (za.n + zb.n - i), 4) >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.6)


