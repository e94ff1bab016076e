#!/usr/bin/env python
"""A/B the small-P dense-bypass admission (DENSE_P_MAX) on the SO(3)
sf1 steady kNN batch (P ~ 1k, the scale where BENCH/BASELINE.md §I
measured ~7% three-level overhead).  DENSE_P_MAX is read at module
import inside executor Python workers, so each arm runs in its own
subprocess with SPARKKD_DENSE_P_MAX set; arms ALTERNATE so host noise
hits both equally (the round-4/5 A/B discipline).

Usage: python jobs/so3_bypass_ab.py [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def worker() -> None:
    from bench import build_session
    from sparkkd import so3engine, synth

    root = synth.ensure_pose_fixtures("sf1")
    spark = build_session(32)
    spark.sparkContext.setLogLevel("ERROR")
    poses = spark.read.parquet(str(root / "poses.parquet"))
    queries = spark.read.parquet(str(root / "pose_queries.parquet"))
    idx = so3engine.So3Index(spark, poses)

    def run() -> tuple[float, int]:
        t = time.time()
        n = idx.knn_join(queries, k=8).count()
        return time.time() - t, n

    run()  # warmup
    secs, rows = [], 0
    for _ in range(2):
        s, rows = run()
        secs.append(round(s, 2))
    print(
        "AB_RESULT "
        + json.dumps(
            {
                "dense_p_max": so3engine.DENSE_P_MAX,
                "n_partitions": int(idx.layout.n_partitions),
                "sec": min(secs),
                "all_secs": secs,
                "rows": rows,
            }
        ),
        flush=True,
    )


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    res = {"bypass": [], "group": []}
    rows = {}
    for _ in range(rounds):
        for arm, thresh in (("bypass", "2048"), ("group", "0")):
            env = dict(os.environ, SPARKKD_DENSE_P_MAX=thresh)
            r = subprocess.run(
                [sys.executable, __file__, "--worker"],
                capture_output=True, text=True, env=env,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("AB_RESULT ")][-1]
            d = json.loads(line[len("AB_RESULT "):])
            res[arm].append(d)
            rows[arm] = d["rows"]
            print(arm, line, flush=True)
    assert rows["bypass"] == rows["group"], rows
    print(
        json.dumps(
            {
                "rows": rows["bypass"],
                "bypass_min": min(d["sec"] for d in res["bypass"]),
                "group_min": min(d["sec"] for d in res["group"]),
            }
        )
    )


if __name__ == "__main__":
    main()
