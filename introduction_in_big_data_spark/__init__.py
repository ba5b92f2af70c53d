"""PySpark-native analytics engine with the capabilities of
mmitrousi/Introduction_in_Big_Data, re-expressed Spark-first.

The reference (see SURVEY.md) is a pandas/stdlib project: batch analytics
with cleaning + joins + top-k (Part_A_Q1.py), user-based collaborative
filtering (Part_A_Q2.py), and a hand-rolled micro-batch stream processor
with exact/approximate counters (Part_B.py). This package provides the
same capabilities — plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) — as lazy
DataFrame plans that Catalyst optimizes and Tungsten executes.

Layout:
    session.py    SparkSession factory (AQE on, Arrow on, UTC)
    sources/      typed readers/writers + the driver test-table catalog
    operators/    cleaning, relational, top-k, CF, sketches, dedup,
                  similarity, text, multimodal
    functions/    reusable column expressions (z-score, cosine, n-grams)
    plans/        the query registry the driver hash-checks vs DuckDB
    streaming/    Structured Streaming counterparts of Part_B.py
"""

__version__ = "0.1.0"
