"""Datapipe scale ladder: embedding_near_dup / minhash_lsh_pairs /
phash_near_dup / near_dup_components at increasing corpus sizes.

VERDICT r4 #4: the pose/geo engines have measured sf0.1->sf2 ladders but
the dedup/ANN marquee ops' scale story rested on tests alone.  This job
produces the raw numbers for BENCH/BASELINE.md:

* per op and corpus size: wall seconds (warm-up + N timed runs, all
  triplets reported), output pairs, pairs/s (or rows/s), plan telemetry
  (admit_tested / admitted bucket pairs for embedding_near_dup, CC
  rounds for near_dup_components), and driver max-RSS after the step —
  flat RSS across the ladder is the no-driver-bottleneck evidence.

Corpora are synthesized DETERMINISTICALLY (fixed seeds) and cached as
parquet under _fixtures/datapipe/:

* embeddings: unit vectors in planted clusters (the near-dup regime the
  detectors exist for), d=64, cluster count scaling with N so avg
  cluster size stays ~100 (output pairs ~50x N — linear in N).
* documents: ~40-word texts over a small vocabulary; 30% are near-dup
  copies of a base doc with a few word substitutions (jaccard ~0.7-0.9),
  the rest independent.
* images: the existing synth image fixtures (sf0.1 = 200k rows).

Usage: python jobs/datapipe_ladder.py [--quick]
Prints one JSON line per (op, scale) measurement.
"""

from __future__ import annotations

import json
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from sparkkd import datapipe, synth

ROOT = Path(__file__).resolve().parent.parent / "_fixtures" / "datapipe"
RUNS = 3


def maxrss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def ensure_embeddings(n: int, seed: int = 7) -> Path:
    out = ROOT / f"emb_{n}.parquet"
    if out.exists():
        return out
    ROOT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    d = 64
    n_clusters = max(50, n // 100)  # avg cluster ~100 -> pairs ~50*N
    cents = rng.normal(size=(n_clusters, d))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cid = rng.integers(0, n_clusters, n)
    X = cents[cid] + 0.01 * rng.normal(size=(n, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X32 = X.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X32.ravel()), d
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, out)
    return out


VOCAB = [
    f"w{i:03d}" for i in range(400)
]


def ensure_documents(n: int, seed: int = 9) -> Path:
    out = ROOT / f"docs_{n}.parquet"
    if out.exists():
        return out
    ROOT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    n_base = int(n * 0.7)
    L = 40
    base = vocab[rng.integers(0, len(vocab), (n_base, L))]
    texts = [" ".join(row) for row in base]
    # near-dup copies: pick a base doc, substitute 2-8 words
    n_dup = n - n_base
    src = rng.integers(0, n_base, n_dup)
    for s in src:
        row = base[s].copy()
        n_sub = int(rng.integers(2, 9))
        pos = rng.choice(L, n_sub, replace=False)
        row[pos] = vocab[rng.integers(0, len(vocab), n_sub)]
        texts.append(" ".join(row))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    pq.write_table(tbl, out)
    return out


def timed(fn, runs: int = RUNS):
    fn()  # warm-up (VM first-touch page faults, JIT, cache fill)
    secs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        secs.append(round(time.perf_counter() - t0, 2))
    return secs, out


def main() -> None:
    quick = "--quick" in sys.argv
    shm = Path("/dev/shm/sparkkd-local")
    shm.mkdir(parents=True, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        # tmpfs shuffle/spill dirs, same rationale as bench.py: the virtio
        # disk serializes spill I/O (and filled up mid-ladder once)
        .config("spark.local.dir", str(shm))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = []

    def emit(**kw):
        kw["driver_maxrss_mb"] = round(maxrss_mb(), 1)
        results.append(kw)
        print(json.dumps(kw), flush=True)

    # ---- distributed-plan A/B (--dist): the round-5 frontier fix.  Same
    # corpus, same window: the driver pair plan vs the hash-blocked
    # distributed plan (_NEAR_DUP_DRIVER_C_MAX forced to 0, block size
    # forced small so multiple tiles actually run).  Pairs must match
    # exactly; wall-clock shows what the scale path costs at bench scale.
    if "--dist" in sys.argv:
        n = 20_000 if quick else 400_000
        emb = spark.read.parquet(str(ensure_embeddings(n)))
        stats: dict = {}

        def run():
            stats.clear()
            return datapipe.embedding_near_dup(emb, stats=stats).count()

        secs, pairs = timed(run)
        emit(
            op="embedding_near_dup_driverplan", n=n, pairs=pairs, secs=secs,
            pairs_per_s=round(pairs / min(secs), 1), **stats,
        )
        saved = (datapipe._NEAR_DUP_DRIVER_C_MAX, datapipe._NEAR_DUP_PLAN_BLOCK)
        datapipe._NEAR_DUP_DRIVER_C_MAX = 0
        datapipe._NEAR_DUP_PLAN_BLOCK = 1024
        try:
            secs2, pairs2 = timed(run)
            emit(
                op="embedding_near_dup_distplan", n=n, pairs=pairs2, secs=secs2,
                pairs_per_s=round(pairs2 / min(secs2), 1), **stats,
            )
        finally:
            datapipe._NEAR_DUP_DRIVER_C_MAX, datapipe._NEAR_DUP_PLAN_BLOCK = saved
        assert pairs2 == pairs, f"plan paths disagree: {pairs} vs {pairs2}"
        print("ALL:", json.dumps(results))
        return

    # ---- embedding_near_dup ladder
    for n in [100_000, 400_000] if not quick else [20_000]:
        p = ensure_embeddings(n)
        emb = spark.read.parquet(str(p))
        stats: dict = {}

        def run():
            stats.clear()
            return datapipe.embedding_near_dup(emb, stats=stats).count()

        secs, pairs = timed(run)
        emit(
            op="embedding_near_dup", n=n, pairs=pairs, secs=secs,
            pairs_per_s=round(pairs / min(secs), 1), **stats,
        )

    # ---- minhash_lsh_pairs ladder
    for n in [20_000, 80_000] if not quick else [2_000]:
        p = ensure_documents(n)
        docs = spark.read.parquet(str(p))

        def run():
            return datapipe.minhash_lsh_pairs(docs, threshold=0.5).count()

        secs, pairs = timed(run)
        emit(
            op="minhash_lsh_pairs", n=n, pairs=pairs, secs=secs,
            docs_per_s=round(n / min(secs), 1),
        )

    # ---- simhash_near_dup ladder (same document fixtures; the heavy
    # stage is simhash64's (doc, tok) x 64-bit vote aggregation — a
    # ~2.4k-rows/doc shuffle that the rung prices honestly)
    for n in [20_000, 80_000] if not quick else [2_000]:
        p = ensure_documents(n)
        docs = spark.read.parquet(str(p))

        def run():
            return datapipe.simhash_near_dup(docs, max_hamming=6).count()

        secs, pairs = timed(run)
        emit(
            op="simhash_near_dup", n=n, pairs=pairs, secs=secs,
            docs_per_s=round(n / min(secs), 1),
        )

    # ---- phash_near_dup ladder (synth image fixtures)
    for tag in ["sf0.01", "sf0.1"] if not quick else ["sf0.01"]:
        root = synth.ensure_fixtures(tag)
        images = spark.read.parquet(str(root / "images.parquet"))
        n = images.count()

        def run():
            return datapipe.phash_near_dup(images, max_hamming=8).count()

        secs, pairs = timed(run)
        emit(
            op="phash_near_dup", n=n, pairs=pairs, secs=secs,
            images_per_s=round(n / min(secs), 1),
        )

    # ---- near_dup_components ladder: clustered pairs + a LONG PATH the
    # pointer doubling must shortcut (diameter >> rounds)
    for n_nodes in [100_000, 1_000_000] if not quick else [10_000]:
        rng = np.random.default_rng(17)
        n_cl = max(1, n_nodes // 100)
        path_len = min(10_000, n_nodes // 2)
        owners = rng.integers(0, n_cl, n_nodes - path_len)
        ids = np.arange(n_nodes - path_len, dtype=np.int64)
        order = np.argsort(owners, kind="stable")
        so, si = owners[order], ids[order]
        first = np.searchsorted(so, np.arange(n_cl))
        cnt = np.diff(np.append(first, len(so)))
        a = np.repeat(si[first], cnt)  # star: member -> cluster rep
        b = si
        keep = a != b
        path_ids = np.arange(n_nodes - path_len, n_nodes, dtype=np.int64)
        ea = np.concatenate([a[keep], path_ids[:-1]])
        eb = np.concatenate([b[keep], path_ids[1:]])
        pairs_df = spark.createDataFrame(
            pa.table({"id_a": pa.array(ea), "id_b": pa.array(eb)})
        )
        stats = {}

        def run():
            stats.clear()
            return datapipe.connected_components(pairs_df, stats=stats).count()

        secs, nodes = timed(run, runs=1)
        emit(
            op="near_dup_components", n_nodes=n_nodes, edges=int(len(ea)),
            labeled=nodes, secs=secs, rounds=stats.get("rounds"),
        )

    print("ALL:", json.dumps(results))


if __name__ == "__main__":
    main()
