"""A PySpark-native analytics engine with the query/data-processing
capabilities of the reference pipeline (news → NER → running entity counts
→ Kafka), rebuilt Spark-first and extended with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Layout:
- ``session``     — SparkSession factory (carries the reference's confs).
- ``sources``     — batch parquet catalog + streaming sources (file/rate/kafka).
- ``functions``   — text / vector / multimodal column expressions and UDFs.
- ``operators``   — dedup, similarity, top-k, sessionization, range join.
- ``plans``       — the named query catalog (queries + DuckDB oracle SQL).
- ``streaming``   — the reference-parity streaming entity-count pipeline.
"""

__version__ = "0.1.0"

from sparkstreamingrealtimedatawithkafka_spark.session import build_session  # noqa: F401
