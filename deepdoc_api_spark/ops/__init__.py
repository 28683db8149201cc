"""Corpus-level training-data operations.

Beyond the reference's per-document operators, a 100 TB training-data
pipeline needs corpus-wide ops: deduplication, similarity search, text
analysis. Each op here is a declarative DataFrame plan (JVM-side
``pyspark.sql.functions`` only — no Python UDFs in these hot paths)
paired with an ANSI-SQL oracle string DuckDB can run on the same
parquet tables, value-exact (integer/string outputs; float math is
done in double with identical association order on both engines).
"""
