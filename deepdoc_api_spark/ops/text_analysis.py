"""Text-analysis ops over the ``documents`` table.

Language-ID (stopword n-gram heuristic), quality scoring, token
counting, and document fingerprinting — all as whole-stage-codegen
column expressions (no Python in the plan). Integer-scaled ratios
(``*_milli`` = ``floor(1000·x)``) keep the DuckDB oracle value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "les", "des", "et", "une"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-split test parquet → spread the regex-heavy projections
    n = spark.sparkContext.defaultParallelism * 2
    return spark.read.parquet(
        f"{sf_dir.rstrip('/')}/documents.parquet"
    ).repartition(n, "doc_id")


def _stop_expr(lang: str) -> str:
    pat = "|".join(_STOPWORDS[lang])
    return f"size(regexp_extract_all(lower(text), '\\\\b({pat})\\\\b', 0))"


def _stop_sql(lang: str) -> str:
    pat = "|".join(_STOPWORDS[lang])
    return f"len(regexp_extract_all(lower(text), '\\b({pat})\\b'))"


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "cast(size(split(trim(text), '\\\\s+')) as bigint) as n_tokens",
        "cast(length(text) as bigint) as n_chars_computed",
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       length(text)::BIGINT AS n_chars_computed
FROM documents
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .selectExpr(
            "doc_id",
            "cast(length(text) as bigint) as n_chars_q",
            "cast(size(split(trim(text), '\\\\s+')) as bigint) as n_words",
            "cast(size(regexp_extract_all(text, '[^\\\\w\\\\s]', 0)) as bigint)"
            " as n_punct",
            f"cast({_stop_expr('en')} as bigint) as n_stop",
        )
        .selectExpr(
            "doc_id",
            "n_chars_q",
            "n_words",
            "cast(floor(1000.0 * n_punct / greatest(n_chars_q, 1)) as bigint)"
            " as punct_milli",
            "cast(floor(1000.0 * n_stop / greatest(n_words, 1)) as bigint)"
            " as stop_milli",
            "case when n_chars_q < 100 then 'short'"
            " when n_stop = 0 then 'no_stopwords'"
            " else 'ok' end as quality",
        )
    )


QUALITY_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         length(text)::BIGINT AS n_chars_q,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
         len(regexp_extract_all(text, '[^\\w\\s]'))::BIGINT AS n_punct,
         {_stop_sql('en')}::BIGINT AS n_stop
  FROM documents
)
SELECT doc_id, n_chars_q, n_words,
       CAST(floor(1000.0 * n_punct / greatest(n_chars_q, 1)) AS BIGINT) AS punct_milli,
       CAST(floor(1000.0 * n_stop / greatest(n_words, 1)) AS BIGINT) AS stop_milli,
       CASE WHEN n_chars_q < 100 THEN 'short'
            WHEN n_stop = 0 THEN 'no_stopwords'
            ELSE 'ok' END AS quality
FROM t
"""


# ---------------------------------------------------------------------------
# language identification (stopword-hit heuristic)
# ---------------------------------------------------------------------------


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .selectExpr(
            "doc_id",
            "lang as lang_declared",
            f"cast({_stop_expr('en')} as bigint) as s_en",
            f"cast({_stop_expr('es')} as bigint) as s_es",
            f"cast({_stop_expr('fr')} as bigint) as s_fr",
            f"cast({_stop_expr('de')} as bigint) as s_de",
        )
        .selectExpr(
            "doc_id",
            "lang_declared",
            "s_en", "s_es", "s_fr", "s_de",
            "case when s_en >= s_es and s_en >= s_fr and s_en >= s_de then 'en'"
            " when s_es >= s_fr and s_es >= s_de then 'es'"
            " when s_fr >= s_de then 'fr'"
            " else 'de' end as lang_pred",
        )
    )


LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang AS lang_declared,
         {_stop_sql('en')}::BIGINT AS s_en,
         {_stop_sql('es')}::BIGINT AS s_es,
         {_stop_sql('fr')}::BIGINT AS s_fr,
         {_stop_sql('de')}::BIGINT AS s_de
  FROM documents
)
SELECT doc_id, lang_declared, s_en, s_es, s_fr, s_de,
       CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
            WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
            WHEN s_fr >= s_de THEN 'fr'
            ELSE 'de' END AS lang_pred
FROM t
"""


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint over whitespace-normalized lowered text, plus
    a 32-bit integer fold usable as a shard/hash key."""
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "md5(regexp_replace(lower(trim(text)), '\\\\s+', ' ')) as fp",
        "cast(conv(substr(md5(regexp_replace(lower(trim(text)), '\\\\s+', ' ')),"
        " 1, 8), 16, 10) as bigint) as fp32",
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 8))::BIGINT AS fp32
FROM documents
"""


# ---------------------------------------------------------------------------
# corpus length histogram (bucketed — the A4 stats analogue over content)
# ---------------------------------------------------------------------------


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .selectExpr("cast(floor(length(text) / 100) * 100 as bigint) as len_bucket")
        .groupBy("len_bucket")
        .count()
        .selectExpr("len_bucket", "cast(count as bigint) as n_docs")
    )


LENGTH_HISTOGRAM_SQL = """
SELECT CAST(floor(length(text) / 100) * 100 AS BIGINT) AS len_bucket,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# rolling-hash fingerprint (polynomial over characters, pure int math)
# ---------------------------------------------------------------------------

_ROLL_MOD = 2_147_483_647  # 2^31 - 1; acc*31 + c stays far inside bigint


def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the character sequence — the
    classic content fingerprint; exact integer math so the oracle
    reproduces it bit-for-bit."""
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "aggregate(split(text, ''), cast(0 as bigint),"
        f" (acc, c) -> (acc * 31 + ascii(c)) % {_ROLL_MOD}) as roll_hash",
    )


ROLLING_FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
         (acc, c) -> (acc * 31 + c) % {_ROLL_MOD}) AS roll_hash
FROM documents
"""
