"""Streaming stratified reservoir (streaming/sampling.py): batch parity,
arrival-order invariance, and version semantics."""
from __future__ import annotations

import pandas as pd
import pytest


def _run_stream(spark, tmpdir, dfs, n, name):
    """Write each df as one parquet file, stream them one per trigger
    through stream_stratified_sample, return the accumulated memory rows."""
    from pgvectorscale_spark.streaming.sampling import stream_stratified_sample

    path = f"{tmpdir}/in_{name}"
    for i, df in enumerate(dfs):
        df.coalesce(1).write.mode("append").parquet(path)
    schema = dfs[0].schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = stream_stratified_sample(stream, "source", n)
    q = (
        out.writeStream.format("memory")
        .queryName(f"strat_{name}")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/ckpt_{name}")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from strat_{name}").toPandas()


def _final_sample(mem: pd.DataFrame) -> set:
    """Max-version rows per stratum -> {(stratum, doc_id, rank)}."""
    latest = mem.groupby("stratum")["version"].max().to_dict()
    keep = mem[mem.apply(lambda r: r["version"] == latest[r["stratum"]], axis=1)]
    return {(r["stratum"], r["doc_id"], r["sample_rank"]) for _, r in keep.iterrows()}


@pytest.fixture()
def doc_batches(spark):
    rows = [(i, f"src{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    return [
        df.filter("doc_id < 30"),
        df.filter("doc_id >= 30 and doc_id < 60"),
        df.filter("doc_id >= 60"),
    ], df


def test_stream_matches_batch_sample(spark, tmpdir, doc_batches):
    batches, full = doc_batches
    mem = _run_stream(spark, tmpdir, batches, 5, "parity")
    got = _final_sample(mem)
    from pgvectorscale_spark.operators.curation import stratified_sample

    exp = {(r["source"], r["doc_id"], r["sample_rank"])
           for r in stratified_sample(full, "source", 5).collect()}
    assert got == exp


def test_arrival_order_invariance(spark, tmpdir, doc_batches):
    """Reversed micro-batch order produces the identical final sample —
    the merge rule is commutative, unlike a random reservoir."""
    batches, full = doc_batches
    a = _final_sample(_run_stream(spark, tmpdir, batches, 4, "fwd"))
    b = _final_sample(_run_stream(spark, tmpdir, list(reversed(batches)), 4, "rev"))
    assert a == b and len(a) == 12  # 3 strata x 4


def test_version_bumps_only_on_change(spark, tmpdir):
    """A micro-batch whose rows all rank below the current sample must not
    re-emit (no version bump); replayed ids never duplicate."""
    df = spark.createDataFrame(
        [(i, "s") for i in range(40)], "doc_id long, source string"
    )
    from pgvectorscale_spark.operators.curation import stratified_sample

    winners = {r["doc_id"] for r in stratified_sample(df, "source", 3).collect()}
    losers = df.filter(~df.doc_id.isin(list(winners)))
    win_df = df.filter(df.doc_id.isin(list(winners)))
    # batch 1: winners; batch 2: losers (no change); batch 3: winners again
    mem = _run_stream(spark, tmpdir, [win_df, losers, win_df], 3, "ver")
    assert mem["version"].max() == 1  # only the first batch changed the sample
    final = _final_sample(mem)
    assert {d for _, d, _ in final} == winners


def test_validation(spark):
    from pgvectorscale_spark.streaming.sampling import stream_stratified_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="positive"):
        stream_stratified_sample(df, "source", 0)
