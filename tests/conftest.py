"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crossai_ts_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="crossai_ts_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_docs():
    """Deterministic tiny corpus incl. all pinned boundary docs (FIXTURES F1)."""
    from crossai_ts_spark.datagen import gen_local

    return gen_local(seed=42, n_docs=20, max_tok=4096)


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_docs):
    from crossai_ts_spark.schema import SEQUENCES_SCHEMA

    return spark.createDataFrame(tiny_docs, schema=SEQUENCES_SCHEMA).cache()
