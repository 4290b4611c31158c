"""training_etl_demo_2_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``aoki-h-jp/training-etl-demo-2`` (an AWS Glue ETL training demo: word
frequency analysis + parquet->key-value sink + a 2-job workflow), built
Spark-first on the DataFrame/SQL API so Catalyst + Tungsten pick the
physical strategy, and extended with the large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) the 100 TB north-star requires.

Layout:
  session.py    SparkSession factory (AQE, shuffle sizing, Arrow)
  io.py         readers/writers + run-directory convention + metadata sidecar
  operators/    query operators (wordcount, relational, dedup, similarity, text, multimodal)
  functions/    reusable column expressions (tokenize, ngrams, hashes, vectors)
  sinks/        batched key-value sink (foreachPartition)
  plans/        Job/Workflow orchestration (the reference's Glue workflow layer)
  streaming/    Structured Streaming surface (windowed aggs with watermark)
"""

__version__ = "0.1.0"
