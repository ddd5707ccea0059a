import os
import sys

import pytest

# before any numpy import — see sketchlib/__init__.py
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (
        SparkSession.builder.master("local[4]")
        .appName("sketchlib-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.executorEnv.NUMPY_MADVISE_HUGEPAGE", "0")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def token_table_path(tmp_path_factory):
    from sketchlib.datagen import generate_token_table
    path = str(tmp_path_factory.mktemp("data") / "token_sequences.parquet")
    generate_token_table(path, rows=2000, seed=1337, dist="zipf")
    return path
