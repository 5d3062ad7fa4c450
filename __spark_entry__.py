"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``sparkstreamingrealtimedatawithkafka_spark.plans``
(one registered entry per implemented operator from SURVEY.md §2); this
module is a thin shim over it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sparkstreamingrealtimedatawithkafka_spark import plans  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference pipeline in
    batch form — tokenize → dictionary entity extraction → explode →
    groupBy(entity).count() → order by count desc
    (mirrors /root/reference/app/spark_entity_counter.py:130-139)."""
    from pyspark.sql import functions as F

    from sparkstreamingrealtimedatawithkafka_spark.plans.text_llm import (
        flagship_entity_count,
    )

    return flagship_entity_count(spark, SF_SMOKE_DIR).orderBy(
        F.desc("cnt"), "entity"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible catalog entry."""
    return plans.oracle_sql()
