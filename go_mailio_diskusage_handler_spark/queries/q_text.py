"""LLM-pipeline: text analysis + fingerprinting + exact dedup.

Split from the monolithic registry.py in round 6; registration
order is preserved by the import sequence in ``..registry``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from ._base import register


# ---------------------------------------------------------------------------
# [EXT] LLM-pipeline: text analysis + fingerprinting + exact dedup
# ---------------------------------------------------------------------------
from ..operators import text  # noqa: E402


@register(
    "text_token_stats",
    rf"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_ish_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_stats(load_table(spark, sf_dir, "documents"))


_EN_STOPS = "', '".join(text.LANG_PROFILES["en"])


@register(
    "text_quality_scores",
    rf"""
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars_actual,
           CAST(len(t) AS INTEGER) AS n_tokens,
           ROUND((length(text) - len(t) + 1) * 1.0 / len(t), 4) AS avg_token_len,
           ROUND(len(regexp_extract_all(text, '[^\w\s]')) * 1.0 /
                 greatest(length(text), 1), 4) AS punct_ratio,
           ROUND(len(list_intersect(t, ['{_EN_STOPS}'])) * 1.0 / len(t), 4)
               AS stopword_kind_ratio,
           ROUND(len(list_distinct(t)) * 1.0 / len(t), 4) AS distinct_ratio
    FROM toks
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_scores(load_table(spark, sf_dir, "documents"))


@register(
    "text_unigram_logprob",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
    freq AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
    tot AS (SELECT SUM(tf) AS total FROM freq)
    SELECT doc_id,
           ROUND(AVG(ln(tf / total)), 4) AS avg_logp,
           COUNT(*) AS n_tok
    FROM toks JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM mean unigram log-prob quality score
    (text.unigram_logprob_scores)."""
    return text.unigram_logprob_scores(load_table(spark, sf_dir, "documents"))


def _ddb_trigram_score(lang: str) -> str:
    return " + ".join(
        f"CAST((length(text) - length(replace(text, '{tg}', ''))) / {len(tg)} AS BIGINT)"
        for tg in text.CHAR_TRIGRAM_PROFILES[lang]
    )


@register(
    "text_language_ngram",
    f"""
    WITH s AS (SELECT doc_id, lang,
                      {_ddb_trigram_score('en')} AS score_en,
                      {_ddb_trigram_score('es')} AS score_es,
                      {_ddb_trigram_score('fr')} AS score_fr,
                      {_ddb_trigram_score('de')} AS score_de
               FROM documents),
    b AS (SELECT *, greatest(score_en, score_es, score_fr, score_de) AS best FROM s)
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN score_en = best THEN 'en'
                WHEN score_es = best THEN 'es'
                WHEN score_fr = best THEN 'fr'
                ELSE 'de' END AS predicted_lang,
           best AS best_score
    FROM b
    """,
)
def text_language_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram language ID (text.language_id_ngram) — the n-gram
    twin of the stopword-profile text_language_id."""
    return text.language_id_ngram(load_table(spark, sf_dir, "documents"))


def _lang_scores_sql() -> str:
    cols = []
    for lang, words in text.LANG_PROFILES.items():
        lst = "', '".join(words)
        cols.append(
            f"CAST(len(list_intersect(t, ['{lst}'])) AS INTEGER) AS score_{lang}"
        )
    return ", ".join(cols)


_LANGS = list(text.LANG_PROFILES)


@register(
    "text_language_id",
    f"""
    WITH scored AS (
        SELECT doc_id, lang, {_lang_scores_sql()}
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE {' '.join(f"WHEN score_{l} = greatest({', '.join('score_' + x for x in _LANGS)}) THEN '{l}'" for l in _LANGS)}
           END AS predicted_lang,
           greatest({', '.join('score_' + x for x in _LANGS)}) AS best_score
    FROM scored
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(load_table(spark, sf_dir, "documents"))


@register(
    "text_fingerprints",
    """
    SELECT doc_id,
           sha256(text) AS content_sha,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS bow_fingerprint,
           md5(substr(text, 1, 64)) AS head_fingerprint
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "text_repetition",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    b AS (SELECT doc_id, array_length(ws) AS n_words,
                 CASE WHEN array_length(ws) >= 2
                      THEN list_transform(range(1, array_length(ws)),
                                          i -> ws[i] || ' ' || ws[i + 1])
                      ELSE CAST([] AS VARCHAR[]) END AS bigs
          FROM w),
    tw AS (SELECT doc_id, MAX(c) AS top_word_count FROM (
               SELECT doc_id, word, COUNT(*) AS c
               FROM (SELECT doc_id, unnest(ws) AS word FROM w)
               GROUP BY doc_id, word)
           GROUP BY doc_id)
    SELECT b.doc_id, CAST(n_words AS INTEGER) AS n_words,
           ROUND(CASE WHEN array_length(bigs) > 0
                      THEN 1.0 - array_length(list_distinct(bigs)) * 1.0
                                 / array_length(bigs)
                      ELSE 0.0 END, 4) AS dup_bigram_frac,
           ROUND(top_word_count * 1.0 / n_words, 4) AS top_word_frac
    FROM b JOIN tw ON b.doc_id = tw.doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (duplicate-bigram
    fraction + top-word dominance) — text.repetition_signals."""
    return text.repetition_signals(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact",
    """
    SELECT sha256(text) AS content_sha,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY content_sha
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.exact_dedup(load_table(spark, sf_dir, "documents"))


