"""Oracle flow metrics + accumulation: hand-checked micro-DEMs and
conservation property tests (SURVEY.md §4 implication (b))."""

import numpy as np
import pytest

from richdem_tpu import synth
from richdem_tpu.oracle import (
    d8_flowdirs, rho8_flowdirs, dinf_flowdirs, flow_proportions,
    flow_accumulation_from_props, d8_accumulation,
)
from richdem_tpu.topology import DX, DY, NO_FLOW


def test_d8_on_tilted_plane_flows_west():
    # Plane rising to the east: steepest descent is due W (direction 1).
    z = np.tile(np.arange(8, dtype=np.float64), (8, 1))
    fd = d8_flowdirs(z)
    # Interior cells flow west; westmost column has no lower nbr -> NO_FLOW
    assert np.all(fd[:, 1:] == 1)
    assert np.all(fd[:, 0] == NO_FLOW)


def test_d8_hand_checked_3x3():
    z = np.array([[5.0, 4.0, 5.0],
                  [5.0, 3.0, 5.0],
                  [5.0, 2.0, 1.0]])
    fd = d8_flowdirs(z)
    assert fd[1, 1] == 6          # center -> SE corner (steepest: (3-1)/√2)
    assert fd[2, 2] == NO_FLOW    # global min
    assert fd[0, 1] == 7          # above center -> S (drop 2/1 beats √2 diag)


def test_d8_tie_break_first_in_scan_order():
    # Symmetric pit borders: W and E drops equal -> direction 1 (W) wins.
    z = np.array([[2.0, 2.0, 2.0],
                  [1.0, 2.0, 1.0],
                  [2.0, 2.0, 2.0]])
    assert d8_flowdirs(z)[1, 1] == 1


def test_proportions_rows_sum_to_one_or_zero():
    dem = synth.perlin_dem(24, seed=4, dtype=np.float64)
    for method in ("D8", "Dinf", "Quinn", "Freeman", "SeibertMcGlynn"):
        props = flow_proportions(dem, method=method)
        sums = props.sum(axis=-1)
        ok = np.isclose(sums, 1.0) | np.isclose(sums, 0.0)
        assert ok.all(), method


def test_dinf_cone_angles_point_outward():
    dem = synth.cone_dem(21, dtype=np.float64)
    ang = dinf_flowdirs(dem)
    # Cell due east of peak: flow east (angle 0); due north: angle pi/2.
    cy = cx = 10
    assert np.isclose(ang[cy, cx + 5] % (2 * np.pi), 0.0, atol=0.2)
    assert np.isclose(ang[cy - 5, cx], np.pi / 2, atol=0.2)
    assert np.isclose(ang[cy, cx - 5], np.pi, atol=0.2)
    assert np.isclose(ang[cy + 5, cx], 3 * np.pi / 2, atol=0.2)


def test_dinf_on_plane_exact_diagonal():
    # z = x + y descends toward (-x, -y) = North-West (grid y points down),
    # whose angle in the CCW-from-East convention is 3π/4.
    y, x = np.mgrid[0:12, 0:12]
    z = (x + y).astype(np.float64)
    ang = dinf_flowdirs(z)
    inner = ang[1:-1, 1:-1]
    assert np.allclose(inner, 3 * np.pi / 4, atol=1e-9)


def test_accumulation_conserves_mass():
    dem = synth.perlin_dem(32, seed=8, dtype=np.float64)
    from richdem_tpu.oracle import priority_flood_epsilon
    filled = priority_flood_epsilon(dem, eps=1e-6)
    for method in ("D8", "Dinf", "Quinn"):
        props = flow_proportions(filled, method=method)
        acc = flow_accumulation_from_props(props)
        assert np.all(acc >= 1.0 - 1e-9)
        # Total inflow absorbed at NO_FLOW cells == number of cells.
        absorbing = props.sum(axis=-1) == 0
        n = dem.size
        assert np.isclose(acc[absorbing].sum(), n, rtol=1e-9), method


def test_accumulation_weighted():
    dem = synth.cone_dem(17, dtype=np.float64)
    # invert: single pit at center absorbs everything
    z = -dem
    props = flow_proportions(z, method="D8")
    w = np.full(z.shape, 2.5)
    acc = flow_accumulation_from_props(props, weights=w)
    assert np.isclose(acc.max(), 2.5 * z.size)


def test_accumulation_raises_on_cycle():
    # Two cells flowing into each other = cycle -> must raise.
    props = np.zeros((1, 2, 8))
    props[0, 0, 4] = 1.0  # east
    props[0, 1, 0] = 1.0  # west
    with pytest.raises(ValueError, match="cycle"):
        flow_accumulation_from_props(props)


def test_d8_accumulation_line():
    # Single row descending to the west: accumulation counts upstream cells.
    z = np.arange(6, dtype=np.float64)[None, :]
    fd = d8_flowdirs(z)
    acc = d8_accumulation(fd)
    np.testing.assert_allclose(acc[0], [6, 5, 4, 3, 2, 1])


def test_rho8_statistical_unbiasedness():
    # On a plane tilted slightly east-of-southeast, Rho8 should mix S/SE/E
    # with expected direction near the true aspect; D8 would lock onto one.
    y, x = np.mgrid[0:40, 0:40]
    z = (-1.0 * x - 0.45 * y).astype(np.float64)
    dirs = []
    for seed in range(30):
        fd = rho8_flowdirs(z, seed=seed)
        dirs.append(fd[5:-5, 5:-5])
    dirs = np.stack(dirs)
    seen = set(np.unique(dirs).tolist())
    assert seen <= {5, 6}  # E and SE only
    frac_se = (dirs == 6).mean()
    # True angle atan(0.45) ≈ 24.2° of 45° => ≈0.54 of the way to SE.
    assert 0.3 < frac_se < 0.8


def test_nodata_blocks_flow():
    dem = synth.perlin_dem(24, seed=2, dtype=np.float64)
    dem2 = synth.with_nodata_holes(dem, no_data=-9999.0, seed=3, n_holes=2)
    nd = dem2 == -9999.0
    fd = d8_flowdirs(dem2, no_data=-9999.0)
    # No data cell flows into a nodata cell.
    h, w = fd.shape
    for r in range(h):
        for c in range(w):
            d = int(fd[r, c])
            if d <= 0:
                continue
            assert not nd[r + int(DY[d]), c + int(DX[d])]
