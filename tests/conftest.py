import pytest

from batch_import_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="batch-import-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.ansi.enabled": "true",  # fail-fast conversion semantics
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()
