"""Exact banded-Hamming phash near-dup join vs brute-force oracle."""

import numpy as np
import pandas as pd
import pytest

from sparkkd import datapipe

pytestmark = pytest.mark.spark


def _img_df(spark, phashes, ids=None):
    ids = ids or [f"img{i:08d}" for i in range(len(phashes))]
    return spark.createDataFrame(
        pd.DataFrame({"image_id": ids, "phash": np.array(phashes, dtype=np.int64)})
    )


def _brute(phashes, ids, t):
    out = []
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j]:
                h = bin((int(phashes[i]) ^ int(phashes[j])) & (2**64 - 1)).count("1")
                if h <= t:
                    out.append((ids[i], ids[j], h))
    return sorted(out)


@pytest.mark.parametrize("t", [0, 4, 8, 15])
def test_banded_hamming_exact(spark, t):
    rng = np.random.default_rng(30)
    base = rng.integers(-(2**62), 2**62, 60, dtype=np.int64)
    # inject controlled near-dups: flip 1..t+2 random bits of some bases
    phashes = list(base)
    for i in range(20):
        flips = rng.integers(0, 64, rng.integers(0, t + 3))
        v = int(base[i]) & (2**64 - 1)
        for f in flips:
            v ^= 1 << int(f)
        phashes.append(np.int64(v - 2**64 if v >= 2**63 else v))
    ids = [f"img{i:08d}" for i in range(len(phashes))]
    got = (
        datapipe.phash_near_dup(_img_df(spark, phashes, ids), max_hamming=t)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want = _brute(phashes, ids, t)
    assert list(map(tuple, got.to_numpy())) == want
    if t >= 4:
        assert len(want) > 0  # fixture actually exercises the op


def test_exact_duplicates_found(spark):
    ph = [123456789, 123456789, -987654321, -987654321, 42]
    got = datapipe.phash_near_dup(_img_df(spark, ph), max_hamming=0).toPandas()
    assert len(got) == 2
    assert (got["hamming"] == 0).all()


def test_phash_near_dup_v2_scheme_identical(spark):
    """The v=2 multi-index (3 blocks x <=2-bit variants, the 10^9 second
    stage) must produce EXACTLY the v=1 scheme's pairs."""
    rng = np.random.default_rng(23)
    base = rng.integers(-(2**62), 2**62, size=200, dtype=np.int64)
    flips = []
    for h in base[:60]:  # plant near-dups at assorted distances 1..10
        nbits = rng.integers(1, 11)
        mask = np.int64(0)
        for b_ in rng.choice(64, size=nbits, replace=False):
            mask |= np.int64(1) << np.int64(int(b_))
        flips.append(h ^ mask)
    phashes = np.concatenate([base, np.array(flips, dtype=np.int64)])
    img = _img_df(spark, phashes)
    a = (
        datapipe.phash_near_dup(img, max_hamming=8, variant_bits=1)
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    b = (
        datapipe.phash_near_dup(img, max_hamming=8, variant_bits=2)
        .toPandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0

def test_simhash_near_dup_matches_brute_force(spark):
    """simhash_near_dup (banding over simhash64 fingerprints) must equal a
    brute-force Hamming self-join over the SAME fingerprints, at multiple
    thresholds and both banding variants."""
    import pandas as pd

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(50)]
    # near-dups: perturb a few words of some docs so hamming lands small
    for i in range(15):
        toks = texts[i].split(" ")
        for p in rng.choice(len(toks), size=rng.integers(1, 4), replace=False):
            toks[p] = str(rng.choice(vocab))
        texts.append(" ".join(toks))
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"d{i:06d}" for i in range(len(texts))],
                      "text": texts})
    )
    sh = datapipe.simhash64(docs).toPandas().sort_values("doc_id")
    ids = sh["doc_id"].tolist()
    fp = sh["simhash"].to_numpy(np.int64)
    for t in (2, 6):
        want = _brute(fp, ids, t)
        for v in (1, 2):
            got = (
                datapipe.simhash_near_dup(docs, max_hamming=t, variant_bits=v)
                .toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            )
            assert list(map(tuple, got.to_numpy())) == want, (t, v)
    assert len(_brute(fp, ids, 6)) > 0  # fixture plants real near-dups
