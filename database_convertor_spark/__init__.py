"""database_convertor_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL/entity-resolution
platform (Peachy1983/Database-convertor, surveyed in /root/repo/SURVEY.md):

- multi-source DataFrame ETL (parquet/CSV/JSON/JDBC readers, MERGE-style
  upsert sinks) — SURVEY §2.1,
- a relational operator core (filters, projections, joins incl. anti/outer,
  aggregations, windows/top-k, set ops) — SURVEY §2.2-2.6,
- a scalar function library (name/address cleaning, date handling,
  similarity measures, confidence ladders) — SURVEY §2.7,
- a fuzzy-match / entity-resolution operator set with blocking — SURVEY J5,
- an incremental/streaming layer (Structured Streaming + watermark dedup,
  tumbling windows, foreachBatch MERGE) — SURVEY §2.8,
- large-scale training-data pipeline operators: dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard, embedding-cosine), similarity search,
  text analysis, multimodal column plumbing.

Everything is declared through the DataFrame/SQL API so Catalyst handles
predicate pushdown, column pruning, join selection and AQE; Python-side
code (pandas UDFs) only appears where built-in expressions genuinely
cannot express the semantics.
"""

__version__ = "0.1.0"
