"""Python DataSource filter pushdown (Spark 4.1 pushFilters): id-range
predicates must narrow the reader's generated span at planning time;
non-pushable predicates must be yielded back for Spark to evaluate."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    LessThan,
    StringStartsWith,
)

from sparkstreamingrealtimedatawithkafka_spark.sources.pysource import (
    SyntheticReader,
    register_python_sources,
)


class _Opts(dict):
    pass


def test_pushfilters_narrows_bounds_and_returns_unsupported():
    r = SyntheticReader(_Opts(n=1000, partitions=4))
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 100),
                LessThan(("id",), 600),
                LessThan(("score_milli",), 500),  # not pushable by contract
                StringStartsWith(("id",), "1"),  # wrong type: not pushable
            ]
        )
    )
    assert r.lo_bound == 100 and r.hi_bound == 600
    assert len(leftover) == 2
    # rows generated = narrowed span, spread over all partitions
    total = sum(
        sum(b.num_rows for b in r.read(p)) for p in r.partitions()
    )
    assert total == 500


def test_equalto_collapses_to_single_row():
    r = SyntheticReader(_Opts(n=1000, partitions=4))
    assert list(r.pushFilters([EqualTo(("id",), 42)])) == []
    assert (r.lo_bound, r.hi_bound) == (42, 43)
    total = sum(sum(b.num_rows for b in r.read(p)) for p in r.partitions())
    assert total == 1


def test_end_to_end_pushdown_equals_unpushed(spark):
    register_python_sources(spark)
    rows = (
        spark.read.format("ssk_synthetic")
        .option("n", 5000)
        .option("partitions", 4)
        .load()
    )
    pred = (F.col("id") >= 1000) & (F.col("id") < 2000) & (F.col("score_milli") < 500)
    got = rows.filter(pred).agg(
        F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
    ).collect()[0]
    # reference: compute in python
    mix = 2654435761
    ids = [i for i in range(1000, 2000) if (i * mix) % 1000 < 500]
    assert got["n"] == len(ids) and got["s"] == sum(ids)
