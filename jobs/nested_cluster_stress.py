#!/usr/bin/env python
"""Nested-cluster stress (round-4 evidence for multi-step refinement).

Corpus: 1M poses — 60% uniform background, 25% rotation cluster
sigma=0.05, 15% NESTED cluster sigma=0.005 inside it.  The nested cluster
is tighter than the FIRST refined grid width, so the round-3 single-step
layout falls back to hash salts there (salts replicate QUERIES — the sf2
pathology), while the round-4 multi-step descent keeps splitting
spatially.

Runs the SAME corpus through both layouts (single-step emulated exactly by
capping MAX_LEAF_LEVEL at base + REFINE_STEP) and reports max salt_n,
partition count and steady kNN batch times.  Usage:

    python jobs/nested_cluster_stress.py [n_poses] [n_queries]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd


def make_corpus(n: int, nq: int, rng: np.random.Generator):
    base = np.array([0.55, 0.5, 0.48, 0.46])
    n_bg = int(n * 0.60)
    n_c1 = int(n * 0.25)
    n_c2 = n - n_bg - n_c1
    bg = rng.normal(size=(n_bg, 4))
    c1 = base + 0.05 * rng.normal(size=(n_c1, 4))
    c2 = base + 0.005 * rng.normal(size=(n_c2, 4))
    P = np.vstack([bg, c1, c2])
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    # queries: half from the nested cluster (the stressed region)
    q1 = base + 0.005 * rng.normal(size=(nq // 2, 4))
    q2 = rng.normal(size=(nq - nq // 2, 4))
    Q = np.vstack([q1, q2])
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    return P, Q


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    rng = np.random.default_rng(404)
    P, Q = make_corpus(n, nq, rng)

    from bench import build_session

    spark = build_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    from sparkkd import so3engine

    poses = spark.createDataFrame(
        pd.DataFrame(
            {
                "pose_id": np.char.add("p", np.arange(n).astype(str)),
                "qw": P[:, 0], "qx": P[:, 1], "qy": P[:, 2], "qz": P[:, 3],
            }
        )
    ).repartition(64).persist()
    poses.count()
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": np.char.add("q", np.arange(nq).astype(str)),
                "qw": Q[:, 0], "qx": Q[:, 1], "qy": Q[:, 2], "qz": Q[:, 3],
            }
        )
    ).persist()
    queries.count()

    out = {}
    full_max = so3engine.MAX_LEAF_LEVEL
    level = so3engine.level_for_poses(n, dims=4)
    for name, cap in (
        ("single_step_r3", min(level + so3engine.REFINE_STEP, full_max)),
        ("multi_step_r4", full_max),
    ):
        so3engine.MAX_LEAF_LEVEL = cap
        try:
            t0 = time.time()
            idx = so3engine.So3Index(spark, poses, n_poses_hint=n)
            build = time.time() - t0
            lay = idx.layout
            idx.knn_join(queries.limit(64), k=8).count()  # warmup
            runs = []
            for _ in range(3):
                t0 = time.time()
                rows = idx.knn_join(queries, k=8).count()
                runs.append(round(time.time() - t0, 2))
            out[name] = {
                "build_sec": round(build, 2),
                "steady_sec": min(runs),
                "all_secs": runs,
                "result_rows": rows,
                "stages": [
                    [int(a), int(b), int(len(c))] for a, b, c in lay.stages
                ],
                "n_partitions": int(lay.n_partitions),
                "max_salt_n": int(lay.p_salt_n.max()),
                "salted_partitions": int((lay.p_salt_n > 1).sum()),
            }
            idx.unpersist()
        finally:
            so3engine.MAX_LEAF_LEVEL = full_max
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
