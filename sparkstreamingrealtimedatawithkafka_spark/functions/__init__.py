from sparkstreamingrealtimedatawithkafka_spark.functions import (  # noqa: F401
    text,
    vector,
)
