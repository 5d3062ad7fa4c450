from sparkstreamingrealtimedatawithkafka_spark.operators import (  # noqa: F401
    dedup,
    similarity,
)
