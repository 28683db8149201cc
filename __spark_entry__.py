"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full extraction+chunking pipeline
(deterministic interleaved-span corpus derived from sf0.001 documents →
fused Arrow kernel → chunks table).

``queries()`` — one entry per implemented operator family from
SURVEY.md §2 plus the corpus-level training-data ops. Callables take
``(spark, sf_dir)``.

``oracle_sql()`` — DuckDB-runnable ANSI SQL for every SQL-expressible
query (identical column names and value-exact outputs: integer-scaled
ratios, double math with matched association order). Span-pipeline
queries are intentionally absent here: their correctness gate is the
in-repo pytest oracle (span-sequence equality vs the driver-side
kernel, `python -m pytest -x -q`), which SQL cannot express — the
driver records rows-only checks for those.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF001 = "/root/testdata/sf0.001"


def _pipeline_chunks(spark: SparkSession, sf_dir: str, chunker_type: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deepdoc_api_spark.job.pipeline import chunk_documents, spans_from_documents
    from deepdoc_api_spark.job.session import ship_package

    ship_package(spark)
    spans = spans_from_documents(spark, sf_dir)
    # array columns are JSON-serialized in the driver-facing projection:
    # the external canonicalizer sorts cell values and cannot hash lists
    # (every array-typed projection err'd in round 1)
    return chunk_documents(spans, chunker_type).select(
        "doc_id", "chunk_index", "kind", "text", "media_ref",
        F.to_json("pages").alias("pages"),
        F.to_json("hierarchy").alias("hierarchy"),
        F.to_json("headings").alias("headings"),
        "chunker_type", "chunk_size", "chunk_overlap",
        F.to_json("bbox").alias("bbox"),
        "extractor_used",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _pipeline_chunks(spark, SF001, "hybrid")


def _q_chunks(chunker_type: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _pipeline_chunks(spark, sf_dir, chunker_type)

    return run


def _q_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _pipeline_chunks(spark, sf_dir, "hybrid")
    from pyspark.sql import functions as F

    return (
        df.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("kind") == "media").cast("long")).alias("n_media"),
            F.sum("chunk_size").alias("total_chars"),
        )
        .selectExpr(
            "doc_id",
            "cast(n_chunks as bigint) n_chunks",
            "cast(n_media as bigint) n_media",
            "cast(total_chars as bigint) total_chars",
        )
    )


def _q_span_kind_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deepdoc_api_spark.job.pipeline import spans_from_documents
    from deepdoc_api_spark.job.session import ship_package

    ship_package(spark)
    spans = spans_from_documents(spark, sf_dir)
    return (
        spans.select(F.explode("spans").alias("s"))
        .groupBy(F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n_spans"))
        .selectExpr("kind", "cast(n_spans as bigint) n_spans")
    )


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoc_api_spark.job.pipeline import spans_from_documents
    from deepdoc_api_spark.job.session import ship_package
    from deepdoc_api_spark.ops.multimodal import extract_media_features, media_catalog

    ship_package(spark)
    spans = spans_from_documents(spark, sf_dir)
    from pyspark.sql import functions as F

    feats = extract_media_features(media_catalog(spans), fake_decode=True)
    # serialize the float-array feature column for the driver canonicalizer
    return feats.select(
        "doc_id", "media_ref", "media_kind", "width", "height", "n_bytes",
        F.to_json("feature").alias("feature"),
    )


def _q_chunks_with_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from deepdoc_api_spark.ops.embeddings import attach_embeddings

    chunks = _pipeline_chunks(spark, sf_dir, "hybrid")
    return attach_embeddings(chunks).select(
        "doc_id", "chunk_index", "kind", "text", "media_ref",
        F.to_json("embeddings").alias("embeddings"),
    )


def _q_fallback_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoc_api_spark.job.session import ship_package
    from deepdoc_api_spark.ops.fallback_text import fallback_window_chunks

    ship_package(spark)
    return fallback_window_chunks(spark, sf_dir)


def _q_hier_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoc_api_spark.job.session import ship_package
    from deepdoc_api_spark.ops.flat_pipeline import hierarchical_flat_chunks

    ship_package(spark)
    return hierarchical_flat_chunks(spark, sf_dir)


def _q_mineru_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoc_api_spark.job.session import ship_package
    from deepdoc_api_spark.ops.flat_pipeline import mineru_flat_chunks

    ship_package(spark)
    return mineru_flat_chunks(spark, sf_dir)


def _q_toc_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoc_api_spark.job.session import ship_package
    from deepdoc_api_spark.ops.flat_pipeline import toc_flat_chunks

    ship_package(spark)
    return toc_flat_chunks(spark, sf_dir)


def _q_hybrid_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoc_api_spark.job.session import ship_package
    from deepdoc_api_spark.ops.flat_pipeline import hybrid_flat_chunks

    ship_package(spark)
    return hybrid_flat_chunks(spark, sf_dir)


def _q_html_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoc_api_spark.job.session import ship_package
    from deepdoc_api_spark.ops.flat_pipeline import html_flat_blocks

    ship_package(spark)
    return html_flat_blocks(spark, sf_dir)


def _q_media_kind_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deepdoc_api_spark.job.pipeline import spans_from_documents
    from deepdoc_api_spark.job.session import ship_package
    from deepdoc_api_spark.ops.multimodal import media_kind_histogram

    ship_package(spark)
    return media_kind_histogram(spans_from_documents(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2)."""
    from deepdoc_api_spark.ops import dedup, similarity, text_analysis

    return {
        # --- span pipeline (O1-O14, K1-K6; pytest oracle, rows-only here)
        "extract_chunks_hybrid": _q_chunks("hybrid"),
        "extract_chunks_hierarchical": _q_chunks("hierarchical"),
        "extract_chunks_toc": _q_chunks("toc"),
        "extract_chunks_mineru": _q_chunks("mineru"),
        "extract_chunks_fallback": _q_chunks("fallback"),
        # K5 window chunker applied to raw document text — the one
        # pipeline-family query with a full DuckDB oracle (the kernel's
        # window arithmetic re-derived independently in a recursive CTE)
        "fallback_window_chunks": _q_fallback_window,
        # K2 + the mineru layout fold (O4/O5/O6/K4/K6) on a flat-title
        # record class where the fold is relationally expressible — the
        # real kernels run on Spark, DuckDB re-derives the fold with
        # window SQL (independent oracle for the fold semantics)
        "hierarchical_flat_chunks": _q_hier_flat,
        "mineru_flat_chunks": _q_mineru_flat,
        "toc_flat_chunks": _q_toc_flat,
        "hybrid_flat_chunks": _q_hybrid_flat,
        # O1 scanner contract on templated markup (nav drop, length
        # filter, link density, media order, table rows)
        "html_flat_blocks": _q_html_flat,
        "chunk_stats_per_doc": _q_chunk_stats,
        "span_kind_histogram": _q_span_kind_histogram,
        # --- multimodal plumbing (rows-only; decode is a spec'd stub)
        "media_features": _q_media_features,
        "media_kind_histogram": _q_media_kind_histogram,
        # --- embedding attachment P8/P9 (rows-only; client is a spec'd stub)
        "chunks_with_embeddings": _q_chunks_with_embeddings,
        # --- text analysis (DuckDB oracle)
        "token_count": text_analysis.token_count,
        "quality_score": text_analysis.quality_score,
        "lang_id": text_analysis.lang_id,
        "doc_fingerprint": text_analysis.fingerprint,
        "length_histogram": text_analysis.length_histogram,
        "rolling_fingerprint": text_analysis.rolling_fingerprint,
        "embedding_norms": similarity.embedding_norms,
        "embedding_near_dup_pairs": similarity.embedding_near_dup_pairs,
        # --- dedup (DuckDB oracle)
        "exact_dedup": dedup.exact_dedup,
        "ngram_doc_frequency": dedup.ngram_doc_frequency,
        "minhash_signatures": dedup.minhash_signatures,
        "lsh_band_buckets": dedup.lsh_band_buckets,
        "jaccard_near_dup_pairs": dedup.jaccard_near_dup_pairs,
        "near_dup_components": dedup.near_dup_components,
        "dedup_verdicts": dedup.dedup_verdicts,
        "simhash16": dedup.simhash16,
        "simhash_words": dedup.simhash_words,
        "simhash_near_dup_pairs": dedup.simhash_near_dup_pairs,
        # --- similarity search (DuckDB oracle)
        "ann_topk_cosine": similarity.brute_force_topk,
        "ann_topk_lsh": similarity.lsh_bucket_topk,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the SQL-expressible queries()."""
    from deepdoc_api_spark.ops import dedup, similarity, text_analysis
    from deepdoc_api_spark.ops.fallback_text import fallback_window_chunks_sql

    from deepdoc_api_spark.ops import flat_pipeline

    return {
        "fallback_window_chunks": fallback_window_chunks_sql(),
        "hierarchical_flat_chunks": flat_pipeline.HIERARCHICAL_FLAT_SQL,
        "mineru_flat_chunks": flat_pipeline.MINERU_FLAT_SQL,
        "toc_flat_chunks": flat_pipeline.TOC_FLAT_SQL,
        "hybrid_flat_chunks": flat_pipeline.HYBRID_FLAT_SQL,
        "html_flat_blocks": flat_pipeline.HTML_FLAT_SQL,
        "token_count": text_analysis.TOKEN_COUNT_SQL,
        "quality_score": text_analysis.QUALITY_SCORE_SQL,
        "lang_id": text_analysis.LANG_ID_SQL,
        "doc_fingerprint": text_analysis.FINGERPRINT_SQL,
        "length_histogram": text_analysis.LENGTH_HISTOGRAM_SQL,
        "rolling_fingerprint": text_analysis.ROLLING_FINGERPRINT_SQL,
        "embedding_norms": similarity.EMBEDDING_NORMS_SQL,
        "embedding_near_dup_pairs": similarity.embedding_near_dup_pairs_sql(),
        "exact_dedup": dedup.EXACT_DEDUP_SQL,
        "ngram_doc_frequency": dedup.ngram_doc_frequency_sql(),
        "minhash_signatures": dedup.MINHASH_SIGNATURES_SQL,
        "lsh_band_buckets": dedup.LSH_BAND_BUCKETS_SQL,
        "jaccard_near_dup_pairs": dedup.jaccard_near_dup_pairs_sql(),
        "near_dup_components": dedup.near_dup_components_sql(),
        "dedup_verdicts": dedup.dedup_verdicts_sql(),
        "simhash16": dedup.SIMHASH16_SQL,
        "simhash_words": dedup.SIMHASH_WORDS_SQL,
        "simhash_near_dup_pairs": dedup.simhash_near_dup_pairs_sql(),
        "ann_topk_cosine": similarity.brute_force_topk_sql(),
        "ann_topk_lsh": similarity.lsh_bucket_topk_sql(),
    }
