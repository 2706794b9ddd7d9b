"""pim_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the query and data-processing capabilities of
the reference PIM ETL pipeline (``nandeep-biztech/pim-etl``), expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, broadcast
hash joins instead of in-memory dict lookups, window-dedup instead of
MongoDB upserts, and Structured Streaming for the incremental path.

Layout
------
- ``session``   SparkSession factory tuned for both local[32] tests and
                large-cluster deployment (AQE, broadcast, shuffle sizing).
- ``sources``   Table/feed loaders (parquet test tables, JSONC feeds).
- ``functions`` Pure column-expression helpers (no Python UDFs).
- ``operators`` The relational operator catalog: every operator from
                SURVEY.md §2 as a named, oracle-checked query.
- ``pipeline``  The PIM bronze→silver→gold dataflow (ingest, unify,
                upsert) as DataFrame pipelines.
- ``llm_ops``   Large-scale training-data operators: dedup (exact /
                MinHash-LSH / SimHash), similarity search, text analysis,
                multimodal column plumbing.
- ``streaming`` Structured Streaming surface (incremental sync,
                watermarked windows, stateful latest-per-key).
"""

__version__ = "0.1.0"
