"""Driver-side invariants of the adaptive pose layout (build_layout /
leaf_key_sql): packing bounds, refinement key disjointness, partition
coverage.  Spark-free except the stats pass, so these run fast."""

import numpy as np
import pandas as pd
import pytest

from sparkkd import so3engine as S
from sparkkd import synth

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def layout(spark):
    root = synth.ensure_pose_fixtures("sf0.001")
    poses = spark.read.parquet(str(root / "poses.parquet"))
    sign = S.canon_sign_sql()
    from pyspark.sql import functions as F

    canon = poses.select(
        "pose_id",
        *S.QCOLS,
        *[(F.expr(f"{sign} * {c}")).alias(f"c{c[1]}") for c in S.QCOLS],
    )
    # small budget forces refinement AND point-mass salting on the cluster
    lay = S.build_layout(
        canon, list(S.CCOLS), [(-1.0, 2.0)] * 4, list(S.CCOLS), 4, 1, 64
    )
    return lay, canon


def test_layout_invariants(spark, layout):
    lay, canon = layout
    n = canon.count()
    # totals reconcile
    assert lay.total == n
    assert lay.p_counts.sum() == n
    # leaves contiguous per pid and p_start consistent
    assert (np.diff(lay.leaf_pid) >= 0).all()
    for p in range(lay.n_partitions):
        s, e = lay.p_start[p], lay.p_start[p + 1]
        assert (lay.leaf_pid[s:e] == p).all()
        assert lay.p_counts[p] == lay.leaf_counts[s:e].sum()
        # partition bbox is the union of member leaf bboxes
        assert np.allclose(lay.p_lo[p], lay.leaf_lo[s:e].min(axis=0))
        assert np.allclose(lay.p_hi[p], lay.leaf_hi[s:e].max(axis=0))
    # packing bound: multi-leaf partitions never exceed the budget;
    # single-leaf overflows carry compensating salts
    for p in range(lay.n_partitions):
        s, e = lay.p_start[p], lay.p_start[p + 1]
        if e - s > 1:
            assert lay.p_counts[p] <= 64
        if lay.p_counts[p] > 64:
            assert lay.p_salt_n[p] == -(-lay.p_counts[p] // 64)
    # refinement happened and the hot base cells no longer appear as leaves
    assert lay.refine_level is not None and len(lay.hot_fine) > 0
    base_keys = (np.int64(lay.level) << S.LVL_SHIFT) + lay.hot_fine
    assert not np.isin(base_keys, lay.leaf_keys).any()
    # leaf keys unique
    assert len(np.unique(lay.leaf_keys)) == len(lay.leaf_keys)


def test_leaf_key_sql_assignment_matches_layout(spark, layout):
    """Every corpus row's SQL leaf key must be one of the layout's leaves
    (the broadcast-map join would silently DROP rows otherwise), and
    per-leaf SQL counts must equal the layout's counts."""
    from pyspark.sql import functions as F

    lay, canon = layout
    expr = S.leaf_key_sql(list(S.CCOLS), [(-1.0, 2.0)] * 4, lay)
    pdf = (
        canon.withColumn("key", F.expr(expr))
        .groupBy("key").count().toPandas().sort_values("key")
    )
    got_keys = pdf["key"].to_numpy(np.int64)
    got_counts = pdf["count"].to_numpy(np.int64)
    order = np.argsort(lay.leaf_keys)
    assert np.array_equal(got_keys, lay.leaf_keys[order])
    assert np.array_equal(got_counts, lay.leaf_counts[order])


def test_multistep_refinement_descent(spark):
    """Round-4 (VERDICT #4): a cluster tighter than the FIRST refined
    width must trigger another descent step, not hash salts — nested
    sigma=0.004 inside sigma=0.05 rotation clusters.  Asserts >= 2
    refinement stages, no salts, SQL assignment == layout counts, and
    exact kNN results through the multi-step layout."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(17)
    base = np.array([0.6, 0.5, 0.45, 0.43])
    outer = base + 0.05 * rng.normal(size=(6000, 4))
    inner = base + 0.004 * rng.normal(size=(8000, 4))
    bg = rng.normal(size=(6000, 4))
    P = np.vstack([outer, inner, bg])
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {
            "pose_id": [f"pose{i:06d}" for i in range(len(P))],
            "qw": P[:, 0], "qx": P[:, 1], "qy": P[:, 2], "qz": P[:, 3],
        }
    )
    poses = spark.createDataFrame(pdf)
    sign = S.canon_sign_sql()
    canon = poses.select(
        "pose_id", *S.QCOLS,
        *[(F.expr(f"{sign} * {c}")).alias(f"c{c[1]}") for c in S.QCOLS],
    )
    b4 = [(-1.0, 2.0)] * 4
    lay = S.build_layout(canon, list(S.CCOLS), b4, list(S.CCOLS), 4, 1, 256)
    assert len(lay.stages) >= 2  # descended past the first refinement
    assert lay.p_salt_n.max() == 1  # spatial splits, never salts
    assert lay.total == len(P)
    # stage nesting: each stage's hot cells sit strictly deeper
    lvls = [s[0] for s in lay.stages] + [lay.stages[-1][1]]
    assert lvls == sorted(lvls) and len(set(lvls)) == len(lvls)
    # SQL assignment matches the layout exactly (no dropped rows)
    expr = S.leaf_key_sql(list(S.CCOLS), b4, lay)
    got = (
        canon.withColumn("key", F.expr(expr))
        .groupBy("key").count().toPandas().sort_values("key")
    )
    order = np.argsort(lay.leaf_keys)
    assert np.array_equal(got["key"].to_numpy(np.int64), lay.leaf_keys[order])
    assert np.array_equal(
        got["count"].to_numpy(np.int64), lay.leaf_counts[order]
    )
    # exact kNN through the multi-step layout: cluster-interior queries
    Q = base + 0.004 * rng.normal(size=(12, 4))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    qdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [f"q{i:06d}" for i in range(len(Q))],
                "qw": Q[:, 0], "qx": Q[:, 1], "qy": Q[:, 2], "qz": Q[:, 3],
            }
        )
    )
    res = (
        S.so3_knn_join(
            spark, poses, qdf, k=5, n_poses_hint=len(P), level=1,
            max_cell_rows=256,
        ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    D = np.arccos(np.minimum(1.0, np.abs(Q @ P.T)))
    pids = pdf["pose_id"].to_numpy()
    for i in range(len(Q)):
        srt = np.lexsort((pids, D[i]))[:5]
        got_q = res[res["query_id"] == f"q{i:06d}"]
        assert list(got_q["pose_id"]) == list(pids[srt]), f"query {i}"
