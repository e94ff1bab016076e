import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from sparkkd.envtune import disable_thp

    disable_thp()

    s = (
        SparkSession.builder.master("local[8]")
        .appName("sparkkd-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf0001_fixtures():
    from sparkkd import synth

    return synth.ensure_fixtures("sf0.001")
