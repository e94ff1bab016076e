"""Long-session storage discipline: repeated joins must not accumulate
persisted intermediates.

Round-5 ADVICE found the radius paths persisting candidate frames into a
registry nothing drained — a long-lived driver (streaming enrichment, a
query service, the fuzz campaign) pins one join's worth of blocks PER
CALL until the storage pool fills.  Every join entry point now drains its
registry (one-shot joins: the module registry; index-owned joins: the
index's own registry, released by ``unpersist()``).  These tests pin that
contract the way the connected-components test pins checkpoint release:
``getPersistentRDDs()`` must reach a steady state under repetition, not
grow per call.
"""

import pytest

from sparkkd import engine, so3engine, synth

pytestmark = pytest.mark.spark


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture(scope="module")
def pose_tables(spark):
    root = synth.ensure_pose_fixtures("sf0.001")
    poses = spark.read.parquet(str(root / "poses.parquet"))
    queries = spark.read.parquet(str(root / "pose_queries.parquet"))
    return poses, queries


def test_so3_index_repeated_joins_reach_steady_storage(spark, pose_tables):
    poses, queries = pose_tables
    base = _n_persisted(spark)
    idx = so3engine.So3Index(spark, poses)
    sizes = []
    for _ in range(3):  # alternate kinds: both drain the SAME registry
        idx.radius_join(queries, 0.05).count()
        sizes.append(_n_persisted(spark))
        idx.knn_join(queries, k=4).count()
        sizes.append(_n_persisted(spark))
    # steady state: later calls may not hold more than the first call of
    # the same kind (registry drained at entry => one call's worth, ever)
    assert sizes[2] <= sizes[0] and sizes[4] <= sizes[2], sizes
    assert sizes[3] <= sizes[1] and sizes[5] <= sizes[3], sizes
    idx.unpersist()
    assert _n_persisted(spark) <= base, (base, _n_persisted(spark), sizes)


def test_oneshot_joins_drain_module_registry(spark, pose_tables):
    poses, queries = pose_tables
    base = _n_persisted(spark)
    first = None
    for _ in range(2):
        so3engine.so3_radius_join(spark, poses, queries, 0.05).count()
        if first is None:
            first = _n_persisted(spark)
    assert _n_persisted(spark) <= first, (first, _n_persisted(spark))
    engine.release_caches()
    assert _n_persisted(spark) <= base, (base, _n_persisted(spark))


def test_geo_oneshot_knn_reaches_steady_storage(spark, sf0001_fixtures):
    root = sf0001_fixtures
    images = spark.read.parquet(str(root / "images.parquet"))
    queries = spark.read.parquet(str(root / "queries.parquet"))
    base = _n_persisted(spark)
    first = None
    for _ in range(2):
        engine.knn_join(spark, images, queries, k=4).count()
        if first is None:
            first = _n_persisted(spark)
    assert _n_persisted(spark) <= first, (first, _n_persisted(spark))
    engine.release_caches()
    assert _n_persisted(spark) <= base, (base, _n_persisted(spark))
