"""cdc_example_spark — a PySpark-native analytics/stream-processing engine.

A brand-new engine with the capabilities of the reference CDC pipeline
(`fzoli/cdc-example`, see SURVEY.md): a Debezium-envelope CDC apply
operator, keyed upsert-materialized views, a batch-relational query
surface, and LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) — all expressed through the public
DataFrame / SQL / Structured Streaming API so that Catalyst + Tungsten
pick the physical strategy, and designed to scale from local[32] tests
to a 1000-executor cluster.

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow)
    schemas.py    explicit StructType literals (never infer in streaming)
    sources/      batch parquet catalog + streaming sources (kafka/files/rate)
    operators/    cdc apply, dedup, similarity, text analysis, sessionize
    functions/    reusable column-expression builders (vector math, text)
    queries/      declared query set Q1..Q22 + LLM-pipeline extensions,
                  each paired with a DuckDB oracle SQL string
    streaming/    envelope decode/route, materialize, windowed analytics
    plans/        plan inspection / explain helpers + 100TB design notes
"""

__version__ = "0.1.0"
