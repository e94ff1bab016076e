"""Large-polygon-table point-in-polygon: the distributed path (no driver
polygon state) must agree with the broadcast path exactly, including on a
polygon table far too large to broadcast comfortably."""

import pandas as pd
import pytest

from sparkkd import engine, synth

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def images(spark, sf0001_fixtures):
    return spark.read.parquet(str(sf0001_fixtures / "images.parquet"))


def _run_both(spark, images, polygons):
    a = (
        engine.pip_join(spark, images, polygons)
        .toPandas()
        .sort_values(["image_id", "poly_id"])
        .reset_index(drop=True)
    )
    b = (
        engine.pip_join(spark, images, polygons, mode="distributed")
        .toPandas()
        .sort_values(["image_id", "poly_id"])
        .reset_index(drop=True)
    )
    return a, b


def test_distributed_pip_matches_broadcast_small(spark, images, sf0001_fixtures):
    polygons = spark.read.parquet(str(sf0001_fixtures / "polygons.parquet"))
    a, b = _run_both(spark, images, polygons)
    assert len(a) > 0
    assert a.equals(b)


def test_distributed_pip_matches_broadcast_10k_polys(spark, images):
    """10k polygons (incl. stars and a donut hole) — the table the
    broadcast path was NOT designed for."""
    polys = synth.gen_polygons(n_poly=10_000, seed=77).to_pandas()
    polygons = spark.createDataFrame(polys)
    a, b = _run_both(spark, images, polygons)
    assert len(a) > 1000  # 10k polygons over 2k images: plenty of hits
    assert a.equals(b)
