"""Property-based kernel tests (hypothesis): the kNN oracle equality must
hold for ARBITRARY point sets — degenerate (duplicates, collinear,
single-value axes), any dimension 1..4, any k, any leaf size."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sparkkd import kernel


@st.composite
def point_sets(draw):
    n = draw(st.integers(min_value=1, max_value=300))
    d = draw(st.integers(min_value=1, max_value=4))
    kind = draw(st.sampled_from(["uniform", "grid", "dups", "collinear"]))
    seed = draw(st.integers(min_value=0, max_value=2**31))
    rng = np.random.default_rng(seed)
    if kind == "uniform":
        pts = rng.uniform(-50, 50, (n, d))
    elif kind == "grid":  # heavy ties in every coordinate
        pts = rng.integers(-3, 4, (n, d)).astype(np.float64)
    elif kind == "dups":
        base = rng.uniform(-5, 5, (max(n // 4, 1), d))
        pts = base[rng.integers(0, len(base), n)]
    else:  # collinear: zero extent on all but one axis
        pts = np.zeros((n, d))
        pts[:, 0] = rng.uniform(-50, 50, n)
    nq = draw(st.integers(min_value=1, max_value=40))
    q = rng.uniform(-60, 60, (nq, d))
    k = draw(st.integers(min_value=1, max_value=25))
    leaf = draw(st.sampled_from([1, 2, 8, 32, None]))
    return pts, q, k, leaf


@given(point_sets())
@settings(max_examples=60, deadline=None)
def test_knn_always_matches_brute_force(case):
    pts, q, k, leaf = case
    tree = kernel.build(pts, leaf_size=leaf)
    got = kernel.knn(tree, q, k)
    want = kernel.brute_force_knn(pts, q, k)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])
    assert np.array_equal(got[2], want[2])


@given(point_sets(), st.floats(min_value=0.0, max_value=30.0))
@settings(max_examples=40, deadline=None)
def test_radius_always_matches_brute_force(case, r):
    pts, q, _, leaf = case
    tree = kernel.build(pts, leaf_size=leaf)
    qi, idx, dist = kernel.radius(tree, q, r)
    diff = q[:, None, :] - pts[None, :, :]
    dm = np.sqrt((diff * diff).sum(axis=2))
    want = set(zip(*[x.tolist() for x in np.nonzero(dm <= r)]))
    assert set(zip(qi.tolist(), idx.tolist())) == want
