"""Property-based soundness of the round-4 pruning geometry: the rotation
lower/upper bounds must bracket the true angular distance for ARBITRARY
canonical pose sets, and the triangle-pre-pruned near-dup plan must equal
the dense scan for ARBITRARY bucket shapes."""

import numpy as np
from hypothesis import given, settings, strategies as st

from sparkkd import datapipe
from sparkkd import so3engine as S


@st.composite
def pose_boxes(draw):
    seed = draw(st.integers(min_value=0, max_value=2**31))
    n_boxes = draw(st.integers(min_value=1, max_value=12))
    per = draw(st.integers(min_value=1, max_value=40))
    spread = draw(st.sampled_from([0.001, 0.05, 0.5, 2.0]))
    nq = draw(st.integers(min_value=1, max_value=10))
    rng = np.random.default_rng(seed)
    groups = []
    for _ in range(n_boxes):
        c = rng.normal(size=4)
        g = c + spread * rng.normal(size=(per, 4))
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        g *= S.canon_sign_np(g)[:, None]
        groups.append(g)
    Q = rng.normal(size=(nq, 4))
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    Q *= S.canon_sign_np(Q)[:, None]
    return groups, Q


@given(pose_boxes())
@settings(max_examples=60, deadline=None)
def test_rot_bounds_bracket_true_angles(data):
    groups, Q = data
    lo = np.array([g.min(axis=0) for g in groups])
    hi = np.array([g.max(axis=0) for g in groups])
    lb = S._rot_lb(Q, lo, hi)
    ub = S._rot_ub(Q, lo, hi)
    for j, g in enumerate(groups):
        ang = np.arccos(np.minimum(1.0, np.abs(Q @ g.T)))  # (nq, per)
        amin = ang.min(axis=1)
        amax = ang.max(axis=1)
        assert (lb[:, j] <= amin + 1e-9).all()
        assert (ub[:, j] >= amax - 1e-9).all() or (
            ub[:, j] >= np.pi / 2 - 1e-12
        ).all()
    # paired variant agrees with the matrix variant
    qi = np.repeat(np.arange(len(Q)), len(groups))
    bi = np.tile(np.arange(len(groups)), len(Q))
    lbp = S._rot_lb_pairs(Q[qi], lo[bi], hi[bi])
    assert np.allclose(lbp, lb[qi, bi], atol=1e-12)


@given(
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=1, max_value=120),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([0.01, 0.3, 1.5, 8.0]),
)
@settings(max_examples=40, deadline=None)
def test_near_dup_plan_property_equals_dense(seed, C, d, r):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(C, d)) * rng.choice([0.1, 1.0, 10.0])
    half = np.abs(rng.normal(size=(C, d))) * rng.choice([0.01, 0.5, 3.0])
    lo, hi = centers - half, centers + half
    counts = rng.integers(1, 100, C).astype(np.int64)
    pairs, work, shuffle, _ = datapipe._near_dup_plan(counts, lo, hi, float(r))
    gap2 = np.zeros((C, C))
    for j in range(d):
        a = lo[:, j][None, :] - hi[:, j][:, None]
        g = np.maximum(np.maximum(a, a.T), 0.0)
        gap2 += g * g
    iu, ju = np.nonzero(np.triu(np.sqrt(gap2) <= r))
    assert pairs.shape == (len(iu), 2)
    assert (pairs[:, 0] == iu).all() and (pairs[:, 1] == ju).all()
