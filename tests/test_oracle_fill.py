"""Oracle Priority-Flood validated against an INDEPENDENT brute-force
Jacobi fixpoint — the 'multiple independent implementations of the same
mathematical object' backbone of the reference's test strategy
(SURVEY.md §4 item 1, appendix A.2)."""

import numpy as np
import pytest

from richdem_tpu import synth
from richdem_tpu.oracle import (
    priority_flood_fill, priority_flood_epsilon, priority_flood_flowdirs,
    priority_flood_watersheds, pit_mask,
)
from richdem_tpu.oracle.fill import _nodata_mask, _seed_cells
from richdem_tpu.topology import DX, DY, NO_FLOW, FLOWDIR_NO_DATA


def jacobi_fill(dem, no_data=None, eps=0.0, max_iter=100000):
    """Brute-force least fixpoint of W = max(Z, min_nbr(W + eps))."""
    z = np.asarray(dem, dtype=np.float64)
    nodata = _nodata_mask(z, no_data)
    seeds = _seed_cells(nodata)
    w = np.where(seeds | nodata, z, np.inf)
    h, wd = z.shape
    for _ in range(max_iter):
        padded = np.pad(np.where(nodata, -np.inf, w), 1,
                        constant_values=np.inf)
        best = np.full_like(w, np.inf)
        for d in range(1, 9):
            shifted = padded[1 + DY[d]:1 + DY[d] + h,
                             1 + DX[d]:1 + DX[d] + wd]
            best = np.minimum(best, shifted + eps)
        new = np.where(seeds | nodata, w, np.maximum(z, best))
        if np.array_equal(new, w, equal_nan=True):
            break
        w = new
    return np.where(nodata, z, w)


@pytest.mark.parametrize("eps", [0.0, 1e-3])
def test_fill_matches_independent_fixpoint(eps):
    dem = synth.depression_dem(48, seed=3, dtype=np.float64)
    got = (priority_flood_epsilon(dem, eps=eps) if eps
           else priority_flood_fill(dem))
    want = jacobi_fill(dem, eps=eps)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_fill_with_nodata_matches_fixpoint():
    dem = synth.depression_dem(40, seed=5, dtype=np.float64)
    dem = synth.with_nodata_holes(dem, no_data=-9999.0, seed=1, n_holes=3)
    got = priority_flood_fill(dem, no_data=-9999.0)
    want = jacobi_fill(dem, no_data=-9999.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
    # nodata cells preserved verbatim
    assert np.all(got[dem == -9999.0] == -9999.0)


def test_fill_is_monotone_and_idempotent():
    dem = synth.depression_dem(40, seed=7, dtype=np.float64)
    filled = priority_flood_fill(dem)
    assert np.all(filled >= dem)
    np.testing.assert_array_equal(priority_flood_fill(filled), filled)


def test_fill_cone_is_identity():
    dem = synth.cone_dem(33, dtype=np.float64)
    np.testing.assert_array_equal(priority_flood_fill(dem), dem)


def test_epsilon_fill_strictly_drains():
    """After epsilon fill every non-seed cell has a strictly lower nbr."""
    dem = synth.depression_dem(40, seed=11, dtype=np.float64)
    filled = priority_flood_epsilon(dem, eps=1e-3)
    h, w = filled.shape
    seeds = _seed_cells(np.zeros((h, w), bool))
    for r in range(h):
        for c in range(w):
            if seeds[r, c]:
                continue
            lower = any(
                0 <= r + DY[d] < h and 0 <= c + DX[d] < w
                and filled[r + DY[d], c + DX[d]] < filled[r, c]
                for d in range(1, 9))
            assert lower, (r, c)


def test_flowdirs_variant_terminates_at_edges():
    dem = synth.depression_dem(32, seed=2, dtype=np.float64)
    filled, fd = priority_flood_flowdirs(dem)
    h, w = fd.shape
    assert np.all(fd >= 0)  # every data cell assigned
    # Follow flow from every cell: must reach a NO_FLOW (seed) cell.
    for r0 in range(h):
        for c0 in range(w):
            r, c = r0, c0
            for _ in range(h * w + 1):
                d = int(fd[r, c])
                if d == NO_FLOW:
                    break
                r, c = r + int(DY[d]), c + int(DX[d])
            else:
                raise AssertionError(f"cycle from {(r0, c0)}")
            assert r in (0, h - 1) or c in (0, w - 1)


def test_watersheds_cover_and_connect():
    dem = synth.depression_dem(32, seed=9, dtype=np.float64)
    _, labels = priority_flood_watersheds(dem)
    assert np.all(labels >= 0)


def test_pit_mask_marks_depressions():
    dem = synth.depression_dem(48, seed=3, dtype=np.float64)
    mask = pit_mask(dem)
    assert mask.any()  # depression_dem guarantees pits
    filled = priority_flood_fill(dem)
    np.testing.assert_array_equal(mask, filled > dem)
    # cone has no pits
    assert not pit_mask(synth.cone_dem(33, dtype=np.float64)).any()


def test_flowdir_nodata_marking():
    dem = synth.depression_dem(24, seed=1, dtype=np.float64)
    dem = synth.with_nodata_holes(dem, no_data=-9999.0, seed=4, n_holes=2)
    _, fd = priority_flood_flowdirs(dem, no_data=-9999.0)
    assert np.all(fd[dem == -9999.0] == FLOWDIR_NO_DATA)
    assert np.all(fd[dem != -9999.0] >= 0)


# -- r2: three-engine fill cross-validation (the reference's own backbone:
#    Barnes2014 ↔ Zhou2016 ↔ Wei2018 agree cell-for-cell, SURVEY §4) ----

def _fill_fixtures():
    yield synth.depression_dem(64, seed=3, dtype=np.float32), None
    yield synth.perlin_dem(56, 72, seed=9, dtype=np.float64), None
    yield synth.plateau_dem(48, dtype=np.float64), None
    dem = synth.with_nodata_holes(
        synth.depression_dem(60, seed=5, dtype=np.float32),
        no_data=-9999.0)
    yield dem, -9999.0
    # nested depressions: pit inside a crater inside a basin
    y, x = np.mgrid[0:64, 0:64].astype(np.float64)
    r = np.hypot(y - 32, x - 32)
    dem = 50.0 - 0.3 * r + 8.0 * np.cos(r / 4.0)
    dem[0, 7] = 0.0  # outlet notch
    yield dem, None


def test_fill_variants_three_way_agreement():
    from richdem_tpu.oracle.fill_variants import wei_fill, zhou_fill
    for dem, nd in _fill_fixtures():
        want = priority_flood_fill(dem, no_data=nd, dtype=np.float64)
        got_z = zhou_fill(dem, no_data=nd)
        got_w = wei_fill(dem, no_data=nd)
        np.testing.assert_array_equal(got_z, want)
        np.testing.assert_array_equal(got_w, want)
