from __future__ import annotations

import os

import pytest

from kaer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="kaer-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="session")
def corpus(documents, embeddings):
    """documents ⋈ embeddings — the materialized collection the fixtures
    use to bypass the embedding provider (FIXTURES.md)."""
    return documents.join(
        embeddings, documents.doc_id == embeddings.vec_id, "inner"
    ).drop("vec_id")
