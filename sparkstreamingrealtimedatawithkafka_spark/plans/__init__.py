from sparkstreamingrealtimedatawithkafka_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
    register,
)

# Importing the catalog modules populates REGISTRY.
from sparkstreamingrealtimedatawithkafka_spark.plans import (  # noqa: F401,E402
    relational,
    text_llm,
    events,
    streaming_queries,
)
