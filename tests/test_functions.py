"""Scalar/space function library: golden values + SO(3) kNN exactness.

Mirrors the reference's space unit tests (test/spaces_test.cpp): exact L2
vs hand formula (:5-18), SO(3) distances pi/2, pi/3, pi/6 within 1e-13
(:20-37), ratio-weighted scaling (:39-52), SE(3) compound weighted sum
(:54-77); plus the SO(3) antipodal-reduction kNN vs a brute-force oracle.
"""

import numpy as np
import pytest

from sparkkd import functions as fx


def test_l2_distance_golden():
    # exact 3-4-5 triangle (spaces_test.cpp:5-18 style hand value)
    assert fx.l2_distance(np.array([0.0, 0.0]), np.array([3.0, 4.0])) == 5.0
    a = np.array([[1.0, 2.0, 3.0]])
    assert fx.l2_distance(a, a)[0] == 0.0


def test_l2_interpolate():
    a, b = np.array([0.0, 0.0]), np.array([2.0, 4.0])
    assert np.allclose(fx.l2_interpolate(a, b, 0.5), [1.0, 2.0])
    assert np.allclose(fx.l2_interpolate(a, b, 0.0), a)
    assert np.allclose(fx.l2_interpolate(a, b, 1.0), b)


def test_l2_is_valid_bounds():
    bounds = np.array([[0.0, 1.0], [0.0, 2.0]])
    pts = np.array([[0.5, 1.0], [1.0, 0.5], [np.nan, 0.5], [0.5, np.inf]])
    assert fx.l2_is_valid(pts, bounds).tolist() == [True, False, False, False]


IDENT = np.array([1.0, 0.0, 0.0, 0.0])


def _rot_w(angle):
    """quaternion for rotation by `angle` about a fixed axis."""
    return np.array([np.cos(angle / 2), np.sin(angle / 2), 0.0, 0.0])


@pytest.mark.parametrize(
    "angle,want",
    [(np.pi, np.pi / 2), (2 * np.pi / 3, np.pi / 3), (np.pi / 3, np.pi / 6)],
)
def test_so3_distance_golden(angle, want):
    """Reference golden values (spaces_test.cpp:20-37): distance between
    identity and rotation-by-angle is angle/2 in quaternion space."""
    assert abs(fx.so3_distance(IDENT, _rot_w(angle)) - want) < 1e-13


def test_so3_distance_antipodal_symmetry():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(100, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    p = rng.normal(size=(100, 4))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    assert np.allclose(fx.so3_distance(q, p), fx.so3_distance(-q, p))
    assert (fx.so3_distance(q, p) <= np.pi / 2 + 1e-12).all()


def test_so3_interpolate_slerp():
    a = IDENT
    b = _rot_w(np.pi / 2)
    mid = fx.so3_interpolate(a, b, 0.5)
    # halfway rotation: distance to both ends equal
    d1, d2 = fx.so3_distance(a, mid), fx.so3_distance(mid, b)
    assert abs(d1 - d2) < 1e-12
    assert np.allclose(fx.so3_interpolate(a, b, 0.0), a)
    # sign flip: slerp to -b equals slerp to b (shortest arc)
    assert np.allclose(fx.so3_interpolate(a, -b, 0.5), fx.so3_interpolate(a, b, 0.5))


def test_weighted_and_compound():
    # ratio-weighted scaling (spaces_test.cpp:39-52) and SE(3) compound sum
    d = np.array([2.0])
    assert fx.weighted_distance(d, 2.5)[0] == 5.0
    q1, q2 = IDENT, _rot_w(np.pi / 3)
    t1, t2 = np.array([0.0, 0.0, 0.0]), np.array([3.0, 4.0, 0.0])
    got = fx.se3_distance(q1, t1, q2, t2, rot_weight=2.0, trans_weight=0.5)
    want = 2.0 * (np.pi / 6) + 0.5 * 5.0
    assert abs(got - want) < 1e-9  # (spaces_test.cpp:54-77 tolerance)


def test_so3_volume_index():
    assert fx.so3_volume_index(np.array([0.9, 0.1, 0.1, 0.1])) == 0
    assert fx.so3_volume_index(np.array([0.1, -0.95, 0.1, 0.1])) == 1
    assert fx.so3_volume_index(np.array([[0.1, 0.1, 0.1, 0.9]]))[0] == 3


def _random_unit_quats(n, rng):
    """Uniform quaternions via the subgroup algorithm
    (test/state_sampler.hpp:38-57)."""
    u1, u2, u3 = rng.uniform(size=n), rng.uniform(size=n), rng.uniform(size=n)
    return np.column_stack(
        [
            np.sqrt(1 - u1) * np.sin(2 * np.pi * u2),
            np.sqrt(1 - u1) * np.cos(2 * np.pi * u2),
            np.sqrt(u1) * np.sin(2 * np.pi * u3),
            np.sqrt(u1) * np.cos(2 * np.pi * u3),
        ]
    )


@pytest.mark.parametrize("k", [1, 4, 16])
def test_so3_knn_matches_brute_force(k):
    """Exact angular kNN via the R^4 antipodal reduction vs brute force
    (the SO(3) analogue of testKNN, test/kdtree_test.cpp:70-105)."""
    rng = np.random.default_rng(21)
    pts = _random_unit_quats(3000, rng)
    q = _random_unit_quats(300, rng)
    qi, idx, ang = fx.so3_knn(pts, q, k)
    # brute force oracle on the true angular metric
    dots = np.abs(q @ pts.T)
    D = np.arccos(np.clip(dots, -1.0, 1.0))
    for i in range(len(q)):
        order = np.lexsort((np.arange(len(pts)), D[i]))[:k]
        got_idx = idx[qi == i]
        assert np.array_equal(got_idx, order), i
        assert np.allclose(ang[qi == i], D[i][order], atol=1e-12)


def test_so3_knn_self_query():
    rng = np.random.default_rng(22)
    pts = _random_unit_quats(500, rng)
    qi, idx, ang = fx.so3_knn(pts, pts[:50], 1)
    assert np.array_equal(idx, np.arange(50))
    assert (ang < 1e-7).all()


def test_log2_floor():
    n = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 2**40])
    want = np.array([0, 1, 1, 2, 2, 3, 9, 10, 40])
    assert np.array_equal(fx.log2_floor(n), want)


def test_rotate_coeffs_properties():
    """F9 (src/_so3space.hpp:48-60): output leads with the volume's
    coefficient, non-negative, and is a signed permutation (norm kept)."""
    rng = np.random.default_rng(11)
    q = rng.normal(size=(64, 4))
    q /= np.sqrt((q * q).sum(axis=1, keepdims=True))
    vol = fx.so3_volume_index(q)
    r = fx.rotate_coeffs(q, vol)
    # leading coefficient is the volume's (largest-|.|) one, made positive
    assert np.allclose(np.abs(r[:, 0]), np.abs(q[np.arange(len(q)), vol]))
    assert (r[:, 0] >= 0).all()
    assert np.allclose((r * r).sum(axis=1), 1.0)
    # element i is +-q[(vol+i) % 4]
    for i in range(4):
        src = q[np.arange(len(q)), (vol + i) % 4]
        assert np.allclose(np.abs(r[:, i]), np.abs(src))


def test_project_to_axis_unit_2vector():
    """F10 (src/_so3space.hpp:530-540): unit 2-vectors, non-negative lead,
    and the projection preserves the coefficient ratio."""
    rng = np.random.default_rng(12)
    q = rng.normal(size=(32, 4))
    q /= np.sqrt((q * q).sum(axis=1, keepdims=True))
    vol = fx.so3_volume_index(q)
    for axis in range(3):
        v = fx.project_to_axis(q, vol, np.full(len(q), axis))
        assert np.allclose((v * v).sum(axis=1), 1.0)
        assert (v[:, 0] >= 0).all()
        r = fx.rotate_coeffs(q, vol)
        expect_ratio = r[:, axis + 1] / r[:, 0]
        assert np.allclose(v[:, 1] / v[:, 0], expect_ratio)


def test_slerp_exact_matches_simd_slerp():
    """slerp_exact (libm, oracle expression order) must agree with the
    SIMD so3_interpolate to float tolerance, be a unit quaternion, and hit
    the endpoints exactly."""
    rng = np.random.default_rng(3)
    a = rng.normal(size=(256, 4))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = rng.normal(size=(256, 4))
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    for t in (0.0, 0.25, 0.5, 1.0):
        s = fx.slerp_exact(a, b, t)
        assert np.allclose(np.linalg.norm(s, axis=1), 1.0, atol=1e-12)
        ref = fx.so3_interpolate(a, b, np.full(len(a), t))
        # same rotation: |dot| == 1 up to float noise
        assert np.allclose(np.abs((s * ref).sum(axis=1)), 1.0, atol=1e-9)
    # degenerate: a == b stays put (small-theta branch)
    s = fx.slerp_exact(a, a, 0.25)
    assert np.allclose(np.abs((s * a).sum(axis=1)), 1.0, atol=1e-12)
