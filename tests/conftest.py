import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.appName("sparkglm-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


@pytest.fixture(scope="session")
def iris_df(spark):
    """F6 iris fixture (FIXTURES.md): deterministic synthetic stand-in with
    the same schema/levels — 150 rows, 3 species."""
    import numpy as np

    rng = np.random.default_rng(42)
    rows = []
    for i, sp in enumerate(["setosa", "versicolor", "virginica"]):
        for _ in range(50):
            pl = 1.5 + 1.8 * i + rng.normal(0, 0.3)
            pw = 0.25 + 1.0 * i + rng.normal(0, 0.15)
            sw = 3.4 - 0.3 * i + 0.2 * pl - 0.3 * pw + rng.normal(0, 0.25)
            sl = 5.0 + 0.8 * i + rng.normal(0, 0.35)
            rows.append((float(sl), float(sw), float(pl), float(pw), sp))
    return spark.createDataFrame(
        rows, "Sepal_Length double, Sepal_Width double, Petal_Length double, Petal_Width double, Species string"
    )
