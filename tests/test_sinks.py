"""Bucketed Parquet sink (sources/sinks.py): the zero-Exchange claims
are asserted against executed plans, not docstrings."""
from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pgvectorscale_spark.sources.sinks import write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def bucketed_pair(spark, embeddings):
    base = embeddings.select("vec_id", "label")
    tmp = tempfile.mkdtemp(prefix="bucketed_")
    # one writing task per bucket -> one file per bucket, the layout
    # Spark requires before it trusts sortBy metadata (see the sink's
    # docstring); repartition uses the same murmur3 hash as bucketing
    pre = base.repartition(8, "vec_id")
    a = write_bucketed(pre, "t_bucket_a", 8, "vec_id", sort_cols="vec_id", path=f"{tmp}/a")
    b = write_bucketed(pre, "t_bucket_b", 8, "vec_id", sort_cols="vec_id", path=f"{tmp}/b")
    yield a, b, base
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_round_trip_content(bucketed_pair):
    a, _, base = bucketed_pair
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, base.collect()))


def test_bucketed_join_has_no_exchange(no_broadcast, bucketed_pair, spark):
    a, b, base = bucketed_pair
    joined = a.join(b.withColumnRenamed("label", "label_b"), "vec_id")
    plan = _plan(joined)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert "SortMergeJoin" in plan
    # with one file per bucket AND the (off-by-default since 3.0) scan-
    # ordering conf, sortBy metadata also removes the Sort below the join
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        sorted_plan = _plan(
            a.join(b.withColumnRenamed("label", "label_b"), "vec_id")
        )
        assert "Sort " not in sorted_plan.replace("SortMergeJoin", ""), sorted_plan
    finally:
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    # and the result is the plain join's result
    expect = base.join(
        base.withColumnRenamed("label", "label_b"), "vec_id"
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))


def test_bucketed_groupby_has_no_exchange(bucketed_pair):
    a, _, base = bucketed_pair
    agg = a.groupBy("vec_id").agg(F.count("*").alias("n"))
    plan = _plan(agg)
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
    assert agg.filter("n != 1").count() == 0


def test_unbucketed_join_does_shuffle(no_broadcast, spark, embeddings):
    # the control: the same join without bucketing pays two Exchanges
    base = embeddings.select("vec_id", "label")
    plan = _plan(base.join(base.withColumnRenamed("label", "l2"), "vec_id"))
    assert "Exchange" in plan


def test_validation():
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(None, "t", 0, "x")
    with pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(None, "t", 4, [])
