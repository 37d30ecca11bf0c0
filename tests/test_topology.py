import numpy as np

from richdem_tpu import topology as T


def test_offsets_are_the_eight_neighbors():
    offs = {(int(T.DX[d]), int(T.DY[d])) for d in range(1, 9)}
    assert offs == {(-1, 0), (-1, -1), (0, -1), (1, -1),
                    (1, 0), (1, 1), (0, 1), (-1, 1)}
    assert (int(T.DX[0]), int(T.DY[0])) == (0, 0)


def test_inverse_directions_round_trip():
    for d in range(1, 9):
        inv = int(T.D8_INVERSE[d])
        assert int(T.DX[inv]) == -int(T.DX[d])
        assert int(T.DY[inv]) == -int(T.DY[d])
        assert int(T.D8_INVERSE[inv]) == d


def test_distances():
    for d in range(1, 9):
        expected = np.hypot(float(T.DX[d]), float(T.DY[d]))
        assert np.isclose(T.DR[d], expected)
        assert T.IS_DIAGONAL[d] == (expected > 1.0)


def test_direction_angles_match_offsets():
    # Angle convention: CCW from East with North = -y (up).
    for d in range(1, 9):
        ang = float(T.DIRECTION_ANGLE[d])
        vec = np.array([np.cos(ang), -np.sin(ang)])  # (dx, dy) with y down
        expected = np.array([T.DX[d], T.DY[d]], dtype=float)
        expected /= np.linalg.norm(expected)
        assert np.allclose(vec, expected, atol=1e-12), d


def test_neighbors_iteration_in_bounds():
    ns = list(T.neighbors(0, 0, 4, 4))
    assert {(nr, nc) for _, nr, nc in ns} == {(0, 1), (1, 0), (1, 1)}
    ns4 = list(T.neighbors(1, 1, 4, 4, T.Topology.D4))
    assert len(ns4) == 4
