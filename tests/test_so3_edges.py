"""Adversarial edge cases for the adaptive pose engine: point masses that
refinement cannot split (hash-salt fallback), duplicate coordinates with
distinct ids (tie semantics), k exceeding the corpus, self-queries."""

import numpy as np
import pandas as pd
import pytest

from sparkkd import so3engine

pytestmark = pytest.mark.spark


def _pose_df(spark, q, t=None, prefix="pose"):
    n = len(q)
    if t is None:
        t = np.zeros((n, 3))
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "pose_id": [f"{prefix}{i:06d}" for i in range(n)],
                "qw": q[:, 0], "qx": q[:, 1], "qy": q[:, 2], "qz": q[:, 3],
                "tx": t[:, 0], "ty": t[:, 1], "tz": t[:, 2],
            }
        )
    )


def _query_df(spark, q, t=None):
    df = _pose_df(spark, q, t, prefix="q")
    return df.withColumnRenamed("pose_id", "query_id")


def _brute_ang(Q, P):
    return np.arccos(np.minimum(1.0, np.abs(Q @ P.T)))


def test_point_mass_corpus_hash_salt_fallback(spark):
    """500 copies of ONE rotation (+ jittered ids) cannot be split by any
    grid refinement — the layout must fall back to hash salts and the
    join must still return exact (tie-ordered) results."""
    rng = np.random.default_rng(5)
    base = np.array([0.5, 0.5, 0.5, 0.5])
    P = np.tile(base, (500, 1))
    extra = rng.normal(size=(40, 4))
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    P = np.vstack([P, extra])
    Q = rng.normal(size=(10, 4))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    poses = _pose_df(spark, P)
    queries = _query_df(spark, Q)
    k = 6
    res = (
        so3engine.so3_knn_join(
            spark, poses, queries, k=k, n_poses_hint=len(P), max_cell_rows=64
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    D = _brute_ang(Q, P)
    pids = np.array([f"pose{i:06d}" for i in range(len(P))])
    for i in range(len(Q)):
        srt = np.lexsort((pids, D[i]))[:k]
        got = res[res["query_id"] == f"q{i:06d}"]
        assert list(got["pose_id"]) == list(pids[srt])
        assert np.allclose(got["ang"].to_numpy(), D[i][srt], atol=1e-12)


def test_k_exceeds_corpus_and_single_pose(spark):
    rng = np.random.default_rng(6)
    P = rng.normal(size=(3, 4))
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    Q = rng.normal(size=(5, 4))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    res = (
        so3engine.so3_knn_join(
            spark, _pose_df(spark, P), _query_df(spark, Q), k=10, n_poses_hint=3
        )
        .toPandas()
    )
    # every query returns ALL 3 poses with consecutive ranks
    assert len(res) == 5 * 3
    assert set(res["rank"]) == {1, 2, 3}
    # single-pose corpus
    res1 = (
        so3engine.so3_knn_join(
            spark, _pose_df(spark, P[:1]), _query_df(spark, Q), k=4, n_poses_hint=1
        )
        .toPandas()
    )
    assert len(res1) == 5 and (res1["rank"] == 1).all()


def test_self_queries_return_self_first(spark):
    rng = np.random.default_rng(7)
    P = rng.normal(size=(300, 4))
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    poses = _pose_df(spark, P)
    queries = _query_df(spark, P[:30])
    res = (
        so3engine.so3_knn_join(spark, poses, queries, k=1, n_poses_hint=300)
        .toPandas().sort_values("query_id").reset_index(drop=True)
    )
    assert len(res) == 30
    for r in res.itertuples():
        assert r.pose_id == "pose" + r.query_id[1:]
        # acos(|q.q|) on a float-normalized quaternion is ~2e-8, not 0 —
        # the oracle's formula gives the identical value
        assert r.ang < 1e-6


def test_se3_point_mass_translations(spark):
    """All translations identical (rotations differ): the translation grid
    degenerates to one cell; the compound kernel must still rank by the
    rotation term exactly."""
    rng = np.random.default_rng(8)
    n = 300
    QR = rng.normal(size=(n, 4))
    QR /= np.linalg.norm(QR, axis=1, keepdims=True)
    T = np.tile([1.0, 2.0, 3.0], (n, 1))
    poses = _pose_df(spark, QR, T)
    nq = 12
    Q = rng.normal(size=(nq, 4))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    queries = _query_df(spark, Q, np.tile([1.0, 2.0, 3.0], (nq, 1)))
    rw, tw, k = 2.0, 0.5, 5
    res = (
        so3engine.se3_knn_join(
            spark, poses, queries, k=k, rot_weight=rw, trans_weight=tw,
            n_poses_hint=n,
        )
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    D = rw * _brute_ang(Q, QR)  # translation term is 0
    pids = np.array([f"pose{i:06d}" for i in range(n)])
    for i in range(nq):
        srt = np.lexsort((pids, D[i]))[:k]
        got = res[res["query_id"] == f"q{i:06d}"]
        assert list(got["pose_id"]) == list(pids[srt])
        assert np.allclose(got["dist"].to_numpy(), D[i][srt], atol=1e-9)
