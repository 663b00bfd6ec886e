"""projet5_spark — a PySpark-native analytics/ETL engine.

Re-expresses every capability of the reference
(``VincentBoulard-DataEngineer/Projet5``, surveyed in ``SURVEY.md``) as
declarative Spark DataFrame plans, plus the LLM-data-pipeline extension
surface (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``sources``    readers/writers with explicit schemas + layout recipes
- ``functions``  scalar/expression helpers (strings, dates, keys, text, vectors)
- ``operators``  composable set-based operators (profile, dedup, joins, similarity)
- ``plans``      end-to-end pipelines (reference-parity healthcare, analytics queries)
- ``streaming``  Structured Streaming surface (windows, watermarks, stateful dedup)
"""

__version__ = "0.1.0"
