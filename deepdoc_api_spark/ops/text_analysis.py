"""Text-analysis ops over the ``documents`` table.

Language-ID (stopword n-gram heuristic), quality scoring, token
counting, and document fingerprinting — all as whole-stage-codegen
column expressions (no Python in the plan). Integer-scaled ratios
(``*_milli`` = ``floor(1000·x)``) keep the DuckDB oracle value-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
       len(regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+')) AS n_tokens,
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
         len(regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+')) AS n_words,
         len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]'))::BIGINT AS n_punct,
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
       md5(regexp_replace(lower(trim(text, ' ')), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS fp,
       ('0x' || substr(md5(regexp_replace(lower(trim(text, ' ')), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')), 1, 8))::BIGINT AS fp32
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
#: characters folded per chunk. The round-1 version materialized ONE
#: per-character array for the whole document (`split(text, '')`) — a
#: 1 MB doc became a 10^6-element array per row. The chunked fold is
#: algebraically identical (Horner over blocks:
#: acc' = (acc·31^len(chunk) + H(chunk)) mod M) but only ever
#: materializes ROLL_CHUNK-char arrays, bounding per-row memory.
ROLL_CHUNK = 64

# 31^n mod M for n = 1..ROLL_CHUNK, inlined as a literal lookup (the
# last chunk of a document may be shorter than ROLL_CHUNK)
_POW31 = [1]
for _ in range(ROLL_CHUNK):
    _POW31.append((_POW31[-1] * 31) % _ROLL_MOD)
_POW31_LIT = ",".join(str(p) for p in _POW31[1:])  # index 1 ↔ 31^1


def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the character sequence — the
    classic content fingerprint; exact integer math so the oracle
    reproduces it bit-for-bit. Value-identical to the round-1 whole-doc
    fold (pinned by test)."""
    inner = (
        "aggregate(split(ch, ''), cast(0 as bigint),"
        f" (a, c) -> (a * 31 + ascii(c)) % {_ROLL_MOD})"
    )
    chunks = (
        f"transform(sequence(0, cast(ceil(length(text) / {ROLL_CHUNK}.0) as int) - 1),"
        f" i -> substr(text, i * {ROLL_CHUNK} + 1, {ROLL_CHUNK}))"
    )
    outer = (
        f"aggregate({chunks}, cast(0 as bigint), (acc, ch) ->"
        f" (acc * element_at(array({_POW31_LIT}), length(ch)) + {inner})"
        f" % {_ROLL_MOD})"
    )
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        f"case when length(text) = 0 or text is null then cast(0 as bigint)"
        f" else {outer} end as roll_hash",
    )


def _rolling_sql() -> str:
    # DuckDB's list_reduce carries the accumulator in the element type,
    # so the outer fold packs each chunk's (31^len, inner_hash) into one
    # BIGINT: e = pow·2^31 + h (both < 2^31). The seed 0 prepends
    # cleanly and (acc·(e>>31) + (e & (2^31-1))) mod M unpacks exactly.
    two31 = 1 << 31
    ch = f"substr(text, i * {ROLL_CHUNK} + 1, {ROLL_CHUNK})"
    inner = (
        "list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(string_split({ch}, ''), c -> ord(c)::BIGINT)),"
        f" (a, c) -> (a * 31 + c) % {_ROLL_MOD})"
    )
    packed = (
        f"list_transform(range(0, CAST(ceil(length(text) / {ROLL_CHUNK}.0) AS INTEGER)),"
        f" i -> ([{_POW31_LIT}][length({ch})])::BIGINT * {two31} + {inner})"
    )
    outer = (
        f"list_reduce(list_prepend(0::BIGINT, {packed}), (acc, e) ->"
        f" (acc * (e // {two31}) + (e % {two31})) % {_ROLL_MOD})"
    )
    return (
        "SELECT doc_id, CASE WHEN text IS NULL OR length(text) = 0"
        f" THEN 0::BIGINT ELSE {outer} END AS roll_hash FROM documents"
    )


ROLLING_FINGERPRINT_SQL = _rolling_sql()


# ---------------------------------------------------------------------------
# deterministic dataset split assignment (train/val/test)
# ---------------------------------------------------------------------------

SPLIT_SALT = "split-v1"


def train_eval_split(
    spark: SparkSession,
    sf_dir: str,
    val_permille: int = 10,
    test_permille: int = 10,
) -> DataFrame:
    """Stable train/val/test assignment by content-independent hash of
    the document id — the split a training pipeline needs to be
    reproducible across runs, engines, and corpus growth (a doc's split
    never changes when other docs arrive; md5 keeps the oracle exact).
    """
    bucket = (
        f"cast(conv(substr(md5(concat('{SPLIT_SALT}:', cast(doc_id as string))),"
        " 1, 8), 16, 10) as bigint) % 1000"
    )
    return _docs(spark, sf_dir).selectExpr(
        "doc_id",
        f"cast({bucket} as bigint) as split_bucket",
        f"case when {bucket} < {val_permille} then 'val'"
        f" when {bucket} < {val_permille + test_permille} then 'test'"
        " else 'train' end as split",
    )


def train_eval_split_sql(val_permille: int = 10, test_permille: int = 10) -> str:
    bucket = (
        f"(('0x' || substr(md5('{SPLIT_SALT}:' || doc_id::VARCHAR), 1, 8))::BIGINT"
        " % 1000)"
    )
    return f"""
SELECT doc_id,
       {bucket}::BIGINT AS split_bucket,
       CASE WHEN {bucket} < {val_permille} THEN 'val'
            WHEN {bucket} < {val_permille + test_permille} THEN 'test'
            ELSE 'train' END AS split
FROM documents
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition filters (Rae et al. 2021, §A1.1 heuristics)
# ---------------------------------------------------------------------------


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition/shape signals from the Gopher quality
    rules: duplicate-line fraction, most-frequent-word-bigram fraction,
    mean word length — the filters a web-scale training pipeline runs
    BEFORE near-dup work (repetitive boilerplate pollutes MinHash
    buckets). All ratios are milli/centi ints (exact in both engines).

    Plan shape: the line stats are per-row expressions (no shuffle);
    the top-bigram pass explodes to (doc_id, bigram) with map-side
    combine, aggregates twice (bigram counts, then per-doc max/sum) —
    both shuffles carry scalars keyed by doc, scale-safe.
    """
    docs = _docs(spark, sf_dir)
    lines = docs.selectExpr(
        "doc_id",
        "filter(transform(split(text, '\\n'), l -> trim(l)), l -> l != '')"
        " as lines",
        "split(trim(text), '\\\\s+') as w",
        "trim(text) as t",
    ).selectExpr(
        "doc_id",
        "cast(size(lines) as bigint) as n_lines",
        "cast(floor(1000.0 * (size(lines) - size(array_distinct(lines)))"
        " / greatest(size(lines), 1)) as bigint) as dup_line_milli",
        "cast(floor(100.0 * length(regexp_replace(t, '\\\\s+', ''))"
        " / greatest(size(w), 1)) as bigint) as mean_word_len_centi",
    )
    bigrams = (
        _docs_for_bigrams(spark, sf_dir)
        .filter("size(w) >= 2")
        .selectExpr(
            "doc_id",
            # total CASE (round-5 edge fix): the explode's inferred
            # size()>0 constraint can evaluate this expression BEFORE
            # the size(w) >= 2 pre-filter (Generate pushdown + CSE —
            # see ops/dedup._SHINGLES_EXPR), and a bare sequence
            # descends for 1-word docs
            "explode(case when size(w) >= 2 then"
            " transform(sequence(1, size(w) - 1),"
            " i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))"
            " else array() end) as bg",
        )
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top"), F.sum("n").alias("total"))
        .selectExpr(
            "doc_id",
            "cast(floor(1000.0 * top / total) as bigint) as top_bigram_milli",
        )
    )
    return (
        lines.join(bigrams, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "n_lines",
            "dup_line_milli",
            "mean_word_len_centi",
            "coalesce(top_bigram_milli, cast(0 as bigint)) as top_bigram_milli",
        )
        .selectExpr(
            "*",
            "case when dup_line_milli > 300 then 'repetitive_lines'"
            " when top_bigram_milli > 200 then 'repetitive_bigrams'"
            " when mean_word_len_centi < 300 or mean_word_len_centi > 1000"
            " then 'odd_word_length' else 'ok' end as gopher_flag",
        )
    )


def _docs_for_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = spark.sparkContext.defaultParallelism * 2
    return (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        .repartition(n, "doc_id")
        .selectExpr("doc_id", "split(trim(text), '\\\\s+') as w")
    )


GOPHER_REPETITION_SQL = """
WITH base AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '\n'),
                     l -> trim(l, ' ')), l -> l != '') AS lines,
         regexp_split_to_array(trim(text, ' '), '[ \\t\\n\\x0b\\f\\r]+') AS w,
         trim(text, ' ') AS t
  FROM documents
),
line_stats AS (
  SELECT doc_id,
         len(lines)::BIGINT AS n_lines,
         CAST(floor(1000.0 * (len(lines) - len(list_distinct(lines)))
              / greatest(len(lines), 1)) AS BIGINT) AS dup_line_milli,
         CAST(floor(100.0 * length(regexp_replace(t, '[ \\t\\n\\x0b\\f\\r]+', '', 'g'))
              / greatest(len(w), 1)) AS BIGINT) AS mean_word_len_centi
  FROM base
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i + 1])) AS bg
  FROM base WHERE len(w) >= 2
),
bg_counts AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY doc_id, bg),
bg_top AS (
  SELECT doc_id,
         CAST(floor(1000.0 * max(n) / sum(n)) AS BIGINT) AS top_bigram_milli
  FROM bg_counts GROUP BY doc_id
)
SELECT l.doc_id, l.n_lines, l.dup_line_milli, l.mean_word_len_centi,
       coalesce(b.top_bigram_milli, 0)::BIGINT AS top_bigram_milli,
       CASE WHEN l.dup_line_milli > 300 THEN 'repetitive_lines'
            WHEN coalesce(b.top_bigram_milli, 0) > 200 THEN 'repetitive_bigrams'
            WHEN l.mean_word_len_centi < 300 OR l.mean_word_len_centi > 1000
              THEN 'odd_word_length'
            ELSE 'ok' END AS gopher_flag
FROM line_stats l LEFT JOIN bg_top b USING (doc_id)
"""


# ---------------------------------------------------------------------------
# tf-idf top terms per document
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """Top-``k`` characteristic terms per document, ranked by ``tf/df``
    (rank-equivalent to tf-idf for a fixed corpus size, and — unlike
    ``tf·ln(N/df)`` — exactly reproducible across engines: IEEE division
    is correctly rounded, ``ln`` is not).

    Plan shape: one explode to (doc_id, term) with map-side-combinable
    counts, a document-frequency aggregate on the term, and a term-keyed
    shuffle join of the two — the classic corpus-statistics join; at
    lake scale both sides are partial-aggregated before the exchange
    and the join key space is the vocabulary. ``tf`` is CHECKPOINTED:
    it feeds both the df aggregate and the scored join, and Catalyst
    does not dedupe shared subtrees — without it the corpus was
    scanned and re-exploded twice (round-7 .explain audit, same class
    as unigram_surprisal's 3×).
    """
    from deepdoc_api_spark.ops.dedup import _checkpoint

    words = _docs(spark, sf_dir).selectExpr(
        "doc_id", "explode(split(trim(lower(text)), '\\\\s+')) as term"
    )
    tf = _checkpoint(
        words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    df = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))  # tf rows are per-(doc, term): df = doc count
    )
    scored = tf.join(df, "term").selectExpr(
        "doc_id",
        "term",
        "cast(tf as bigint) as tf",
        "cast(df as bigint) as df",
        "cast(floor(1000000.0 * tf / df) as bigint) as score_micro",
    )
    return (
        scored.withColumn(
            "rank",
            F.expr(
                "row_number() over (partition by doc_id"
                " order by score_micro desc, term asc)"
            ),
        )
        .filter(F.col("rank") <= k)
        .selectExpr("doc_id", "term", "tf", "df", "score_micro",
                    "cast(rank as int) rank")
    )


def tfidf_top_terms_sql(k: int = 5) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text), ' '), '[ \\t\\n\\x0b\\f\\r]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf::BIGINT AS tf, df.df::BIGINT AS df,
         CAST(floor(1000000.0 * tf.tf / df.df) AS BIGINT) AS score_micro
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, score_micro, rank::INTEGER AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score_micro DESC, term ASC) AS rank
  FROM scored)
WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# PII scrubbing (emails/phones) — planted-PII verify path
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?\d[\d -]{7,}\d"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails and phone numbers; report per-doc counts and the
    fingerprint of the scrubbed text — the privacy pass a training
    pipeline runs before anything leaves the lake.

    The synthetic corpus contains no natural PII (counts would be a
    vacuous 0==0 oracle), so each document is AUGMENTED with one
    deterministic email + phone derived from its doc_id — identical
    string arithmetic in both engines — and the scrubber must find and
    redact them value-exactly (emails first, then phones; order is part
    of the contract since the patterns could otherwise overlap).
    """
    e, p = _EMAIL_RE.replace("\\", "\\\\"), _PHONE_RE.replace("\\", "\\\\")
    return (
        _docs(spark, sf_dir)
        .selectExpr(
            "doc_id",
            "concat(text, ' contact user', cast(doc_id as string),"
            " '@example.com tel +1 555 000 ',"
            " cast(doc_id % 10000 as string)) as t",
        )
        .selectExpr(
            "doc_id",
            f"cast(size(regexp_extract_all(t, '{e}', 0)) as bigint) as n_emails",
            f"cast(size(regexp_extract_all(regexp_replace(t, '{e}', '<EMAIL>'),"
            f" '{p}', 0)) as bigint) as n_phones",
            f"md5(regexp_replace(regexp_replace(t, '{e}', '<EMAIL>'),"
            f" '{p}', '<PHONE>')) as scrubbed_fp",
        )
    )


def pii_scrub_sql() -> str:
    e, p = _EMAIL_RE, _PHONE_RE
    return f"""
WITH t AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com tel +1 555 000 '
              || (doc_id % 10000) AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{e}'))::BIGINT AS n_emails,
       len(regexp_extract_all(regexp_replace(t, '{e}', '<EMAIL>', 'g'),
           '{p}'))::BIGINT AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{e}', '<EMAIL>', 'g'),
           '{p}', '<PHONE>', 'g')) AS scrubbed_fp
FROM t
"""


# ---------------------------------------------------------------------------
# corpus source mix (sampling-balance diagnostic)
# ---------------------------------------------------------------------------


def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition: doc count, text volume, and the
    corpus share (milli) — the sampling-balance diagnostic a training
    pipeline checks before mixing sources (an over-represented crawl
    slice gets down-weighted; >200 milli flags dominance). One groupBy
    on the source key plus a 1-row broadcast total; scale-safe."""
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    total = docs.agg(F.count("*").alias("total_docs"))
    return (
        per.join(F.broadcast(total))
        .selectExpr(
            "source",
            "cast(n_docs as bigint) as n_docs",
            "cast(n_chars as bigint) as n_chars",
            "cast(floor(1000.0 * n_docs / total_docs) as bigint) as share_milli",
            "cast(floor(1000.0 * n_docs / total_docs) > 200 as boolean)"
            " as dominant",
        )
    )


SOURCE_MIX_SQL = """
WITH per AS (
  SELECT source, count(*) AS n_docs, sum(length(text)) AS n_chars
  FROM documents GROUP BY source
),
t AS (SELECT count(*) AS total_docs FROM documents)
SELECT source, n_docs::BIGINT AS n_docs, n_chars::BIGINT AS n_chars,
       CAST(floor(1000.0 * n_docs / total_docs) AS BIGINT) AS share_milli,
       (floor(1000.0 * n_docs / total_docs) > 200) AS dominant
FROM per, t
"""


# ---------------------------------------------------------------------------
# eval-set decontamination (n-gram collision against a benchmark set)
# ---------------------------------------------------------------------------

#: decontamination n-gram width. The published practice this models:
#: GPT-3 removed training docs with a 13-gram collision against eval
#: sets; PaLM/Llama use 8-10 word n-grams. 8 keeps every eval item
#: (20 words -> 13 grams) productive on the synthetic corpus.
DECONTAM_N = 8
#: eval items = the first DECONTAM_EVAL_WORDS words of every doc with
#: doc_id % DECONTAM_EVAL_MOD == 1 — a deterministic stand-in benchmark
#: set (at production scale this relation is the real eval suite,
#: always tiny next to the corpus). The source docs are contaminated by
#: construction, giving the verify path guaranteed true positives.
DECONTAM_EVAL_WORDS = 20
DECONTAM_EVAL_MOD = 16
#: hard cap on eval-set size: only doc_id < MOD * MAX_DOCS qualifies, so
#: the eval relation holds at most MAX_DOCS docs (~MAX_DOCS * 13 grams)
#: no matter how large the training corpus grows — the broadcast side
#: is a true constant, not O(corpus/16). At test scales (<= 8192 docs)
#: the predicate is a no-op, so small-SF oracle rows are unchanged.
DECONTAM_EVAL_MAX_DOCS = 512
#: flag threshold: >= this many distinct colliding n-grams. 1 matches
#: the GPT-3 rule; 3 is kept so the output distinguishes hard hits
#: from single-collision near-misses (both are returned).
DECONTAM_FLAG_MIN = 3


def _ngrams_expr(n: int) -> str:
    joined = ", ".join(f"element_at(w, i + {k})" for k in range(n))
    return (
        f"case when size(w) >= {n} then "
        f"transform(sequence(1, size(w) - {n - 1}), i -> concat_ws(' ', {joined})) "
        "else array() end"
    )


def eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus decontamination: docs sharing word {8}-grams with
    the eval set, with the distinct-collision count and the flag.

    Scale shape: the eval set is capped at DECONTAM_EVAL_MAX_DOCS docs
    (doc_id < MOD * MAX_DOCS), so its distinct n-grams are a bounded
    relation (<= ~6.7k grams) at ANY corpus scale and the collision
    join is an eval-side broadcast hash join executed MAP-SIDE over the
    exploded training grams — the only rows that ever reach a shuffle
    are actual collisions (groupBy doc_id on the match set). No
    O(corpus-tokens) shuffle exists in the plan; the explode itself is
    the same single-pass width as ngram_doc_frequency.
    """
    docs = spark.read.parquet(
        f"{sf_dir.rstrip('/')}/documents.parquet"
    ).repartition(spark.sparkContext.defaultParallelism * 2, "doc_id")
    words = docs.selectExpr(
        "doc_id", "split(trim(lower(text)), '\\\\s+') as w"
    )
    eval_grams = (
        words.filter(
            f"doc_id % {DECONTAM_EVAL_MOD} = 1 "
            f"and doc_id < {DECONTAM_EVAL_MOD * DECONTAM_EVAL_MAX_DOCS}"
        )
        .selectExpr(f"slice(w, 1, {DECONTAM_EVAL_WORDS}) as w")
        .selectExpr(f"explode({_ngrams_expr(DECONTAM_N)}) as g")
        .distinct()
    )
    train_grams = words.selectExpr(
        "doc_id", f"explode(array_distinct({_ngrams_expr(DECONTAM_N)})) as g"
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("m"))
        .selectExpr(
            "doc_id",
            "cast(m as bigint) as matched_ngrams",
            f"cast(m >= {DECONTAM_FLAG_MIN} as boolean) as contaminated",
        )
    )


def eval_decontamination_sql() -> str:
    n = DECONTAM_N
    joined = " || ' ' || ".join(f"w[i + {k}]" for k in range(n))
    grams = (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_transform(range(1, len(w) - {n - 1} + 1), i -> {joined}) "
        "ELSE [] END"
    )
    return f"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text), ' '), '[ \\t\\n\\x0b\\f\\r]+') AS w
  FROM documents
),
eval_grams AS (
  SELECT DISTINCT unnest({grams}) AS g
  FROM (SELECT list_slice(w, 1, {DECONTAM_EVAL_WORDS}) AS w FROM words
        WHERE doc_id % {DECONTAM_EVAL_MOD} = 1
          AND doc_id < {DECONTAM_EVAL_MOD * DECONTAM_EVAL_MAX_DOCS})
),
train_grams AS (
  SELECT doc_id, unnest(list_distinct({grams})) AS g FROM words
)
SELECT doc_id, count(*)::BIGINT AS matched_ngrams,
       (count(*) >= {DECONTAM_FLAG_MIN}) AS contaminated
FROM train_grams JOIN eval_grams USING (g)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# fixed-window corpus dedup — the APPLY step at sub-document granularity
# ---------------------------------------------------------------------------
#
# Document-level dedup (exact_dedup / near-dup verdicts) drops whole
# documents; training pipelines ALSO deduplicate repeated sub-document
# content across the corpus — C4 removed any three-sentence span
# occurring more than once ("Exploring the Limits of Transfer
# Learning", Raffel et al. 2020, §2.2) and Lee et al. 2022 dedup
# repeated substrings. The corpus here has no sentence punctuation, so
# the unit is a fixed WINDOW_DEDUP_W-word non-overlapping window: every
# window occurring elsewhere in the corpus is dropped from all but its
# FIRST occurrence (min (doc_id, pos) — the same deterministic keeper
# convention as exact_dedup), and the cleaned document text is
# reconstructed from the surviving windows plus the sub-window tail.
#
# Scale shape: one explode to O(total windows) scalar rows, keeper
# resolution is a map-side-combinable min(struct(doc_id, pos)) agg on
# the window text (no windows/no self-join — the classic wordcount
# shuffle), re-assembly groups by doc_id. At 100 TB the window-text
# shuffle key can be md5'd to bound key bytes; kept verbatim here so
# the oracle shares the exact key.

WINDOW_DEDUP_W = 10


def window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = WINDOW_DEDUP_W
    t = (
        spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism * 2, "doc_id")
        .selectExpr("doc_id", "split(trim(lower(text)), '\\\\s+') as w")
    )
    # size guard BEFORE the sequence: Spark's sequence(1, 0) descends
    # ([1, 0]) instead of yielding an empty array, which would emit two
    # phantom windows for a sub-W-word document (the same footgun the
    # shingle expression guards against — ops/dedup.py). Docs below W
    # words re-enter via the left join as all-tail rows.
    # wins is CHECKPOINTED: the keeper aggregate and the mark-join both
    # consume it, and without the checkpoint the corpus was re-split
    # and re-exploded per consumer (round-7 .explain audit). The final
    # tail join re-reads the pruned (doc_id, text) scan instead — a
    # scalar-only checkpoint, per the containment-op precedent.
    from deepdoc_api_spark.ops.dedup import _checkpoint

    wins = _checkpoint(
        t.filter(f"size(w) >= {w}")
        .selectExpr(
            "doc_id",
            f"posexplode(transform(sequence(1, size(w) div {w}),"
            f" i -> array_join(slice(w, (i - 1) * {w} + 1, {w}), ' ')))"
            " as (pos0, sent)",
        )
        .selectExpr("doc_id", "cast(pos0 + 1 as int) as pos", "sent")
    )
    keepers = wins.groupBy("sent").agg(
        F.expr("min(struct(doc_id, pos))").alias("k"),
        F.count("*").alias("occ"),
    )
    marked = wins.join(keepers, "sent").selectExpr(
        "doc_id",
        "pos",
        "sent",
        "(k.doc_id = doc_id and k.pos = pos) as kept",
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.sum(F.expr("cast(not kept as int)")).alias("n_dropped"),
        F.expr(
            "array_join(transform(filter(array_sort("
            "collect_list(struct(pos, sent, kept))), p -> p.kept),"
            " p -> p.sent), ' ')"
        ).alias("kept_text"),
    )
    return (
        t.join(per_doc, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "coalesce(n_windows, 0) as n_windows",
            "coalesce(n_dropped, 0) as n_dropped",
            # cleaned = surviving windows + the sub-window word tail;
            # concat_ws skips nulls, so either side may be absent
            f"concat_ws(' ', nullif(kept_text, ''),"
            f" nullif(array_join(slice(w, (size(w) div {w}) * {w} + 1,"
            f" size(w) - (size(w) div {w}) * {w}), ' '), '')) as cleaned",
        )
        .selectExpr(
            "doc_id",
            "cast(n_windows as bigint) as n_windows",
            "cast(n_dropped as bigint) as n_dropped",
            "cast(length(cleaned) as bigint) as cleaned_chars",
            "md5(cleaned) as cleaned_fp",
        )
    )


def window_dedup_sql() -> str:
    w = WINDOW_DEDUP_W
    return f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text), ' '), '[ \\t\\n\\x0b\\f\\r]+') AS w
           FROM documents),
wins AS (SELECT doc_id, i::INTEGER AS pos,
                array_to_string(w[(i - 1) * {w} + 1 : i * {w}], ' ') AS sent
         FROM t, unnest(range(1, 1 + len(w) // {w})) AS u(i)),
keep AS (SELECT sent, min(struct_pack(d := doc_id, p := pos)) AS k
         FROM wins GROUP BY sent),
marked AS (SELECT wins.doc_id, wins.pos, wins.sent,
                  (keep.k.d = wins.doc_id AND keep.k.p = wins.pos) AS kept
           FROM wins JOIN keep USING (sent)),
per_doc AS (SELECT doc_id, count(*) AS n_windows,
                   sum(CASE WHEN kept THEN 0 ELSE 1 END) AS n_dropped,
                   array_to_string(list(sent ORDER BY pos)
                     FILTER (WHERE kept), ' ') AS kept_text
            FROM marked GROUP BY doc_id),
clean AS (SELECT t.doc_id,
                 coalesce(per_doc.n_windows, 0) AS n_windows,
                 coalesce(per_doc.n_dropped, 0) AS n_dropped,
                 concat_ws(' ', nullif(per_doc.kept_text, ''),
                   nullif(array_to_string(
                     w[(len(w) // {w}) * {w} + 1 : len(w)], ' '), ''))
                   AS cleaned
          FROM t LEFT JOIN per_doc USING (doc_id))
SELECT doc_id,
       n_windows::BIGINT AS n_windows,
       n_dropped::BIGINT AS n_dropped,
       length(cleaned)::BIGINT AS cleaned_chars,
       md5(cleaned) AS cleaned_fp
FROM clean
"""


# ---------------------------------------------------------------------------
# CCNet-style unigram surprisal scoring (round 6)
# ---------------------------------------------------------------------------


def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal — the CCNet-style language-
    model quality signal (Wenzek et al. 2020 rank documents by LM
    perplexity; a corpus-trained unigram model is its deterministic,
    engine-mirrorable core): rare-word-heavy junk scores high, common
    prose scores low.

    Surprisal is measured in WHOLE BITS so both engines agree exactly:
    ``bits(term) = floor(log2((N + V) div (c + 1)))`` with add-one
    smoothing (c = corpus occurrences of the term, N = total
    occurrences, V = vocabulary size), and floor-log2 of an integer is
    computed EXACTLY as ``length(bin(q)) - 1`` — no transcendental
    function whose last ulp could differ between the JVM and DuckDB
    (the same reason tfidf_top_terms ranks by tf/df instead of
    tf·ln(N/df)).

    Plan shape: per-(doc, term) counts with map-side combine, the
    corpus unigram table derived from them (second small aggregate),
    a term-keyed shuffle join, and a 1-row totals broadcast — the same
    corpus-statistics join family as tfidf/ngram_doc_frequency; at
    lake scale every aggregate partial-combines before its exchange
    and the join key space is the vocabulary. The ``tf`` relation is
    CHECKPOINTED: three consumers hang off it (the scored join, the
    vocabulary counts, and totals via counts), and Catalyst does not
    dedupe shared subtrees — without the checkpoint the corpus was
    scanned and re-exploded into words THREE times (round-7 .explain
    audit: 3 parquet scans / 3 Generates → 1 checkpoint scan).
    """
    from deepdoc_api_spark.ops.dedup import _checkpoint

    words = _docs(spark, sf_dir).selectExpr(
        "doc_id", "explode(split(trim(lower(text)), '\\\\s+')) as term"
    )
    tf = _checkpoint(
        words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v_size")
    )
    scored = (
        tf.join(counts, "term")
        .join(F.broadcast(totals))
        .selectExpr(
            "doc_id",
            "tf",
            "cast(length(bin((n_total + v_size) div (c + 1))) - 1"
            " as bigint) as bits",
        )
    )
    return scored.groupBy("doc_id").agg(
        F.expr("cast(sum(tf) as bigint)").alias("n_words"),
        F.expr("cast(sum(tf * bits) as bigint)").alias("total_bits"),
        F.expr(
            "cast((1000 * sum(tf * bits)) div sum(tf) as bigint)"
        ).alias("mean_bits_milli"),
    )


UNIGRAM_SURPRISAL_SQL = """
WITH words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text), ' '), '[ \\t\\n\\x0b\\f\\r]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term),
counts AS (SELECT term, sum(tf) AS c FROM tf GROUP BY term),
totals AS (SELECT sum(c) AS n_total, count(*) AS v_size FROM counts),
scored AS (
  SELECT tf.doc_id, tf.tf,
         CAST(length(printf('%b', CAST((totals.n_total + totals.v_size)
                                  // (counts.c + 1) AS BIGINT))) - 1
              AS BIGINT) AS bits
  FROM tf JOIN counts USING (term) CROSS JOIN totals
)
SELECT doc_id,
       CAST(sum(tf) AS BIGINT) AS n_words,
       CAST(sum(tf * bits) AS BIGINT) AS total_bits,
       CAST((1000 * sum(tf * bits)) // sum(tf) AS BIGINT) AS mean_bits_milli
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# source-mixture rebalancing APPLY step (round 6)
# ---------------------------------------------------------------------------


def _source_mix_sample_from(docs_labeled: DataFrame) -> DataFrame:
    """Core of :func:`source_mix_sample` over a (doc_id, source)
    relation — split out so the planted-imbalance verify variant can
    relabel sources without duplicating the sampling contract."""
    docs = docs_labeled.selectExpr(
        "doc_id",
        "source",
        "cast(conv(substr(md5(concat('mix:', cast(doc_id as string))),"
        " 1, 8), 16, 10) % 1000 as bigint) as hash_milli",
    )
    counts = docs_labeled.groupBy("source").agg(
        F.count("*").alias("n_docs")
    )
    mn = counts.agg(F.min("n_docs").alias("min_docs"))
    rates = counts.join(F.broadcast(mn)).selectExpr(
        "source",
        "cast(n_docs as bigint) as n_docs",
        "cast((1000 * min_docs) div n_docs as bigint) as rate_milli",
    )
    return docs.join(F.broadcast(rates), "source").selectExpr(
        "doc_id",
        "source",
        "n_docs",
        "rate_milli",
        "hash_milli",
        "cast(hash_milli < rate_milli as boolean) as keep",
    )


def source_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced-mix downsampling — the APPLY step behind
    :func:`source_mix`'s diagnostic: every source is hash-sampled down
    to (approximately) the size of the SMALLEST source, the standard
    corpus-mixture rebalance a training pipeline runs when one crawl
    slice dominates (cf. The Pile / DoReMi mixture reweighting; C4's
    per-source sampling).

    Contract (exactly mirrorable, no RNG): ``rate_milli(source) =
    (1000·min_count) div count(source)`` from the per-source counts,
    and a doc survives iff ``hash_milli(doc_id) < rate_milli`` where
    ``hash_milli`` is the first md5 word of ``'mix:'||doc_id`` mod
    1000 — i.e. an order-free, reproducible ~per-mill coin keyed on
    the document identity alone (re-runs and different partitionings
    keep the identical sample). The smallest source's rate is exactly
    1000, so it survives whole.

    Plan shape: one groupBy(source) count, a 1-row min broadcast back
    onto the per-source rates, a broadcast rate join onto the corpus,
    and a per-row hash — no shuffle of the documents themselves at any
    point; scale-safe at any corpus size (the source key space is
    small by construction).
    """
    return _source_mix_sample_from(_docs(spark, sf_dir).select("doc_id", "source"))


#: planted-imbalance relabel: 12:3:1 head/mid/tail per 16 doc_ids —
#: the driver corpus is perfectly balanced (every source 25 docs), so
#: the raw op keeps everything vacuously; the planted variant forces
#: real rate computation (83/250/1000 milli) and real drops, exactly
#: like the planted-twin variants of containment/semantic dedup.
_MIX_RELABEL = (
    "case when doc_id % 16 < 12 then 'head'"
    " when doc_id % 16 < 15 then 'mid' else 'tail' end"
)


def source_mix_sample_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    relabeled = _docs(spark, sf_dir).selectExpr(
        "doc_id", f"{_MIX_RELABEL} as source"
    )
    return _source_mix_sample_from(relabeled)


def _source_mix_sample_sql(source_expr: str) -> str:
    return f"""
WITH labeled AS (SELECT doc_id, {source_expr} AS source FROM documents),
counts AS (SELECT source, count(*) AS n_docs FROM labeled GROUP BY source),
mn AS (SELECT min(n_docs) AS min_docs FROM counts),
rates AS (
  SELECT source, n_docs::BIGINT AS n_docs,
         CAST((1000 * mn.min_docs) // n_docs AS BIGINT) AS rate_milli
  FROM counts CROSS JOIN mn
),
hashed AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 1000 AS BIGINT) AS hash_milli
  FROM labeled
)
SELECT h.doc_id, h.source, r.n_docs, r.rate_milli, h.hash_milli,
       (h.hash_milli < r.rate_milli) AS keep
FROM hashed h JOIN rates r USING (source)
"""


SOURCE_MIX_SAMPLE_SQL = _source_mix_sample_sql("source")

SOURCE_MIX_SAMPLE_PLANTED_SQL = _source_mix_sample_sql(
    "CASE WHEN doc_id % 16 < 12 THEN 'head'"
    " WHEN doc_id % 16 < 15 THEN 'mid' ELSE 'tail' END"
)


# ---------------------------------------------------------------------------
# exact line-level corpus dedup APPLY step (round 6)
# ---------------------------------------------------------------------------


def _line_dedup_from(docs: DataFrame) -> DataFrame:
    """RefinedWeb-style exact line deduplication across the corpus
    (Penedo et al. 2023 drop duplicated lines/spans left behind by
    boilerplate stripping): every non-empty line that appears anywhere
    else in the corpus keeps only its FIRST occurrence in the global
    deterministic order ``(doc_id, line_idx)``; documents are
    reconstructed from their surviving lines. The line-keyed complement
    of :func:`window_dedup` (fixed word windows, C4/Lee-style):
    boilerplate is usually line-shaped, repeated prose is window-shaped.

    Truly empty lines are exempt (they carry layout, not content, and
    deduping them would collapse every blank separator corpus-wide).
    Output is per-document scalars: line counts, drop count, and the
    md5 fingerprint + length of the cleaned text — value-exact in both
    engines.

    Scale shape: literal-'\\n' split + posexplode to (doc_id, idx,
    line); one shuffle on the line hash for the min-(doc_id, idx)
    keeper aggregate; one join back; one groupBy(doc_id) rebuild. The
    same two-shuffle family as window_dedup/ngram_doc_frequency —
    nothing quadratic, keys are line hashes with natural skew handled
    by the exempt-empty rule (the only truly degenerate key) and AQE.
    The exploded ``lines`` relation is CHECKPOINTED — both the keeper
    aggregate and the mark-join consume it, and without the
    checkpoint the corpus was scanned and re-exploded twice (round-7
    .explain audit).
    """
    from deepdoc_api_spark.ops.dedup import _checkpoint

    lines = _checkpoint(
        docs.repartition(
            docs.sparkSession.sparkContext.defaultParallelism * 2, "doc_id"
        )
        .selectExpr(
            "doc_id",
            "posexplode(split(text, '\\n')) as (idx, line)",
        )
    )
    keepers = (
        lines.filter("length(line) > 0")
        .groupBy("line")
        .agg(
            F.expr("min(struct(doc_id, idx))").alias("k"),
            F.count("*").alias("occ"),
        )
    )
    marked = lines.join(keepers, "line", "left").selectExpr(
        "doc_id",
        "idx",
        "line",
        "(k is null or (k.doc_id = doc_id and k.idx = idx)) as kept",
    )
    return marked.groupBy("doc_id").agg(
        F.expr("cast(count(*) as bigint)").alias("n_lines"),
        F.expr("cast(sum(cast(not kept as int)) as bigint)").alias(
            "n_dup_lines_dropped"
        ),
        F.expr(
            "length(array_join(transform(array_sort(collect_list("
            "case when kept then struct(idx, line) end)),"
            " s -> s.line), char(10)))"
        ).cast("bigint").alias("clean_n_chars"),
        F.expr(
            "md5(array_join(transform(array_sort(collect_list("
            "case when kept then struct(idx, line) end)),"
            " s -> s.line), char(10)))"
        ).alias("clean_fp"),
    )


def line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _line_dedup_from(_docs(spark, sf_dir).select("doc_id", "text"))


#: planted boilerplate: every doc gains a shared header and footer
#: line, and every 5th doc an extra shared quote line — the driver
#: corpus is newline-free with unique texts, so the raw op's zero-drop
#: result is vacuous; the planted lines create real cross-doc
#: repeats at both edges and mid-document (keep-first must pick the
#: GLOBALLY first (doc_id, idx), i.e. doc 0's header/footer survive
#: and all 499 other copies drop).
_LINE_PLANT = (
    "concat('shared boilerplate header', char(10), text,"
    " case when doc_id % 5 = 0"
    " then concat(char(10), 'shared mid-document quote') else '' end,"
    " char(10), 'shared boilerplate footer')"
)


def line_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _line_dedup_from(
        _docs(spark, sf_dir).selectExpr("doc_id", f"{_LINE_PLANT} as text")
    )


def _line_dedup_sql(text_expr: str) -> str:
    return f"""
WITH src AS (SELECT doc_id, {text_expr} AS text FROM documents),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS idx
  FROM src
),
keepers AS (
  SELECT line, min({{'d': doc_id, 'i': idx}}) AS k, count(*) AS occ
  FROM lines WHERE length(line) > 0 GROUP BY line
),
marked AS (
  SELECT l.doc_id, l.idx, l.line,
         (k.k IS NULL OR ((k.k).d = l.doc_id AND (k.k).i = l.idx)) AS kept
  FROM lines l LEFT JOIN keepers k USING (line)
)
SELECT doc_id,
       count(*)::BIGINT AS n_lines,
       sum(CASE WHEN kept THEN 0 ELSE 1 END)::BIGINT AS n_dup_lines_dropped,
       length(coalesce(string_agg(CASE WHEN kept THEN line END, chr(10)
                         ORDER BY idx), ''))::BIGINT AS clean_n_chars,
       md5(coalesce(string_agg(CASE WHEN kept THEN line END, chr(10)
                      ORDER BY idx), '')) AS clean_fp
FROM marked GROUP BY doc_id
"""


LINE_DEDUP_SQL = _line_dedup_sql("text")

LINE_DEDUP_PLANTED_SQL = _line_dedup_sql(
    "concat('shared boilerplate header', chr(10), text,"
    " CASE WHEN doc_id % 5 = 0"
    " THEN concat(chr(10), 'shared mid-document quote') ELSE '' END,"
    " chr(10), 'shared boilerplate footer')"
)


# ---------------------------------------------------------------------------
# GPT-style sequence packing (round 7)
# ---------------------------------------------------------------------------

#: training window length in tokens (GPT-2 used 1024, Llama 2048/4096)
SEQ_PACK_WINDOW = 2048

#: docs per prefix-sum bucket — sized so NO single task ever sees more
#: than ~4M tiny (doc_id, n_tokens) rows: at 10^12 documents the
#: bucket-level cumulative window runs over 10^12/2^22 ≈ 238k rows
#: (one small task) and each intra-bucket window partition holds ≤2^22
#: rows (~64 MB of longs). A third level extends the same recursion to
#: 10^18. Values are bucketing-invariant (exact integer prefix sums),
#: so the DuckDB mirror uses one flat cumulative window.
SEQ_PACK_BUCKET = 1 << 22


def sequence_packing(
    spark: SparkSession, sf_dir: str, window: int = SEQ_PACK_WINDOW
) -> DataFrame:
    """Per-document packing provenance under GPT-style pretraining
    sequence packing: every document (in global ``doc_id`` order,
    whitespace token count per the ``token_count`` contract, ONE EOD
    token appended each) is concatenated into a single token stream
    and chopped into fixed ``window``-token training sequences — the
    standard concat-and-chop batching of GPT-2/3- and Llama-style
    pretraining (Brown et al. 2020 §2.2 pack documents with an
    end-of-text delimiter; RedPajama/Pile training recipes likewise).

    Output per doc: its stream ``start_offset``, the first/last
    training window it touches (``last_window`` includes its EOD
    token, which also defines empty docs unambiguously), how many
    windows it spans, and whether a window boundary splits it — the
    signal a curriculum/attention-masking pipeline consumes (split
    docs get cross-document attention unless masked).

    Plan shape (the 100 TB story): a distributed TWO-LEVEL prefix sum
    — per-bucket token totals (one small aggregate), ONE tiny
    unpartitioned cumulative window over the ≤n/2^22 bucket rows,
    broadcast back, then an intra-bucket cumulative window partitioned
    by bucket. No global sort of the corpus, no single task over more
    than 2^22 scalar rows; the token counting itself is whole-stage
    codegen, and the scalar (doc_id, n_tokens, bkt) projection is
    CHECKPOINTED once so the bucket-sum branch and the per-doc branch
    share one tokenization pass over the corpus instead of re-reading
    ``text`` twice (verified via .explain: without the checkpoint the
    parquet scan + tokenize appeared in both join branches). (A naive
    ``Window.orderBy(doc_id)`` with no partition — the obvious
    spelling — serializes the ENTIRE corpus through one task; this op
    exists in two stages precisely to avoid that.)
    """
    from deepdoc_api_spark.ops.dedup import _checkpoint

    counts = _checkpoint(
        _docs(spark, sf_dir).selectExpr(
            "doc_id",
            "cast(size(split(trim(text), '\\\\s+')) as bigint) as n_tokens",
            f"cast(doc_id div {SEQ_PACK_BUCKET} as bigint) as bkt",
        )
    )
    bucket_sums = counts.groupBy("bkt").agg(
        F.expr("cast(sum(n_tokens + 1) as bigint)").alias("bkt_tokens")
    )
    offs = bucket_sums.selectExpr(
        "bkt",
        "cast(coalesce(sum(bkt_tokens) over (order by bkt"
        " rows between unbounded preceding and 1 preceding), 0)"
        " as bigint) as bkt_start",
    )
    return (
        counts.join(F.broadcast(offs), "bkt")
        .selectExpr(
            "doc_id",
            "n_tokens",
            "cast(bkt_start + coalesce(sum(n_tokens + 1) over ("
            " partition by bkt order by doc_id"
            " rows between unbounded preceding and 1 preceding), 0)"
            " as bigint) as start_offset",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "start_offset",
            f"cast(start_offset div {window} as bigint) as first_window",
            f"cast((start_offset + n_tokens) div {window} as bigint)"
            " as last_window",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "start_offset",
            "first_window",
            "last_window",
            "cast(last_window - first_window + 1 as bigint) as n_windows",
            "cast(last_window != first_window as boolean) as is_split",
        )
    )


def sequence_packing_sql(window: int = SEQ_PACK_WINDOW) -> str:
    """DuckDB mirror: one flat cumulative window (prefix sums are
    bucketing-invariant, so the two-level Spark plan and this flat
    spelling agree exactly); token count per the TOKEN_COUNT_SQL
    contract (Java \\s class spelled out)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text, ' '),
             '[ \\t\\n\\x0b\\f\\r]+'))::BIGINT AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens + 1) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS start_offset
  FROM t
)
SELECT doc_id, n_tokens, start_offset,
       (start_offset // {window})::BIGINT AS first_window,
       ((start_offset + n_tokens) // {window})::BIGINT AS last_window,
       ((start_offset + n_tokens) // {window}
        - start_offset // {window} + 1)::BIGINT AS n_windows,
       ((start_offset + n_tokens) // {window}
        <> start_offset // {window}) AS is_split
FROM o
"""


SEQUENCE_PACKING_SQL = sequence_packing_sql()
