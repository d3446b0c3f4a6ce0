from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.appName("pgvectorscale-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def make_fixture_f1(spark, n=300, d=64, seed=42):
    """FIXTURES.md F1: uniform [0,1) float32 vectors, ids 0..n-1."""
    rng = np.random.default_rng(seed)
    mat = rng.random((n, d), dtype=np.float32)
    rows = [(i, mat[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    return df, mat


def make_vectors(spark, n=100, dim=16, seed=42):
    """Seeded corpus in the embeddings-table shape (vec_id, embedding)."""
    rng = np.random.default_rng(seed)
    mat = rng.random((n, dim), dtype=np.float32)
    rows = [(i, mat[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def make_fixture_f4(spark, n=50, d=16, seed=42, num_labels=16):
    """FIXTURES.md F4: labeled corpus with NULL / empty / null-element edge rows."""
    rng = np.random.default_rng(seed)
    mat = (rng.random((n, d), dtype=np.float32) * 2 - 1).astype(np.float32)
    rows = []
    for i in range(n):
        if i % 10 == 7:
            labels = None
        elif i % 10 == 8:
            labels = []
        else:
            labels = sorted({int(rng.integers(1, num_labels + 1)) for _ in range(2)})
        rows.append((i, mat[i].tolist(), labels))
    df = spark.createDataFrame(rows, "id long, embedding array<float>, labels array<smallint>")
    return df, mat, rows
