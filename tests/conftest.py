"""Shared fixtures (modeled on the reference's tests/conftest.py:14-73)."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from pystore_spark.session import get_spark

    s = get_spark(app_name="pystore_spark_tests", master="local[4]",
                  shuffle_partitions=4)
    yield s


@pytest.fixture()
def temp_store_path(monkeypatch):
    path = tempfile.mkdtemp(prefix="pystore_spark_test_")
    monkeypatch.setenv("PYSTORE_SPARK_PATH", path)
    import pystore_spark.config as config

    config._path = None
    yield path
    shutil.rmtree(path, ignore_errors=True)
    config._path = None


@pytest.fixture()
def test_store(spark, temp_store_path):
    import pystore_spark as ps

    return ps.store("test_store", spark=spark)


@pytest.fixture()
def test_collection(test_store):
    return test_store.collection("test_collection")


@pytest.fixture()
def sample_data():
    rng = np.random.default_rng(42)
    n = 100
    idx = pd.date_range("2024-01-01", periods=n, freq="D")
    return pd.DataFrame(
        {
            "value1": rng.standard_normal(n),
            "value2": rng.standard_normal(n) * 100,
            "category": pd.Categorical(
                rng.choice(["A", "B", "C"], size=n)
            ).astype(str),
        },
        index=idx,
    )


@pytest.fixture()
def sample_data_with_duplicates():
    rng = np.random.default_rng(7)
    dates = list(pd.date_range("2024-01-01", periods=50, freq="D"))
    dates += dates[-10:]  # last 10 repeat
    return pd.DataFrame(
        {"value": rng.standard_normal(len(dates))}, index=pd.DatetimeIndex(dates)
    )


@pytest.fixture()
def sample_data_nanosecond():
    base = pd.Timestamp("2024-01-01").value
    rng = np.random.default_rng(3)
    idx = pd.to_datetime(
        [base + i * 1_000_000_000 + int(rng.integers(0, 1000)) for i in range(10)]
    )
    return pd.DataFrame({"value": rng.standard_normal(10)}, index=idx)
