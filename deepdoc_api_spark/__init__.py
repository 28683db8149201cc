"""deepdoc_api_spark — a PySpark-native extraction-and-chunking engine.

A from-scratch rebuild of the capabilities of TrueSelph/deepdoc_api (a
FastAPI + docling document-processing service) as a distributed Spark
DataFrame job over a table of interleaved text+media documents:

    (doc_id: string,
     spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>)

Architecture (Spark-first, not a port):

- ``kernels/``  — pure-Python document kernels (HTML main-content
  extraction, PDF-layout formatting, chunkers, tokenizer). Zero Spark
  imports; unit-testable; double as the in-driver correctness oracle.
- ``job/``      — the Spark layer: Arrow-vectorized ``mapInPandas``
  pipeline, skew sharding for giant documents, per-partition
  checkpointed progress with resume.
- ``ops/``      — corpus-level training-data operations (dedup,
  similarity search, text analysis) as declarative DataFrame plans.
- ``datagen.py`` — deterministic synthetic interleaved-span corpus
  generator (seed-stable, derived from the driver-provided
  ``documents`` table).
"""

__version__ = "0.1.0"
