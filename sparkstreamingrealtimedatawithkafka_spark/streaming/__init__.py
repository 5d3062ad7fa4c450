from sparkstreamingrealtimedatawithkafka_spark.streaming.pipeline import (  # noqa: F401
    ARTICLE_SCHEMA,
    entity_counts,
    parse_articles,
    run_to_memory,
)
