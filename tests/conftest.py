from __future__ import annotations

import tempfile

import pytest

from bootcamp_stackacademy_datalake_minio_airflow_spark.session import get_spark


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "minio: live object-store round-trip (needs S3_ENDPOINT + creds)",
    )
    config.addinivalue_line(
        "markers",
        "slow: whole-registry sweeps (plan audits) — minutes, not seconds",
    )


@pytest.fixture(scope="session")
def spark():
    warehouse = tempfile.mkdtemp(prefix="spark-warehouse-")
    s = get_spark(
        "pytest",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
