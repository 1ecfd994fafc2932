"""parquet_ingestor_spark — a PySpark-native analytics/ingest engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference streaming ETL engine ``baldanca/parquet-ingestor`` (source →
transform → batch → encode(Parquet) → sink → ack), extended with the
relational query surface (joins / aggregations / windows / set ops) and
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) that a 100 TB Spark deployment needs.

Layout:
  session        SparkSession factory (tuned for scale; local[*] in tests)
  catalog        testdata table loading / temp-view registration
  queries/       the declared query inventory (SURVEY.md §2.3), DuckDB-checked
  operators/     dedup, similarity, text analysis, multimodal plumbing
  pipeline       the ingest pipeline (reference parity: batch + streaming)
  streaming/     windowed/stateful streaming helpers
  observability  StreamingQueryListener metrics (reference metric taxonomy)
  adaptive       monitor-only adaptive-runtime recommendations
"""

__version__ = "0.1.0"
