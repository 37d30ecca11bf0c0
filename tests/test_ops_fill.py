"""Device fill (sweep fixpoint) vs oracle Priority-Flood — the core
allclose gate (SURVEY.md §4 implication (a))."""

import numpy as np
import pytest

from richdem_tpu import synth
from richdem_tpu.oracle import priority_flood_fill, priority_flood_epsilon
from richdem_tpu.ops.fill import (
    fill_depressions, fill_depressions_info, auto_epsilon,
)


DEMS = {
    "cone": lambda: synth.cone_dem(64, dtype=np.float64),
    "inverted_cone": lambda: synth.inverted_cone_dem(64, dtype=np.float64),
    "depressions": lambda: synth.depression_dem(64, seed=3,
                                                dtype=np.float64),
    "perlin": lambda: synth.perlin_dem(64, seed=7, dtype=np.float64),
    "plateau": lambda: synth.plateau_dem(48, dtype=np.float64),
    "saddle": lambda: synth.saddle_dem(48, dtype=np.float64),
}


@pytest.mark.parametrize("name", sorted(DEMS))
def test_fill_matches_oracle(name):
    dem = DEMS[name]()
    got = np.asarray(fill_depressions(dem))
    want = priority_flood_fill(dem)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


@pytest.mark.parametrize("eps", [1e-4, 1e-2])
def test_epsilon_fill_matches_oracle(eps):
    dem = synth.depression_dem(48, seed=5, dtype=np.float64)
    got = np.asarray(fill_depressions(dem, eps=eps))
    want = priority_flood_epsilon(dem, eps=eps)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_fill_with_nodata_matches_oracle():
    dem = synth.depression_dem(48, seed=9, dtype=np.float64)
    dem = synth.with_nodata_holes(dem, no_data=-9999.0, seed=2, n_holes=3)
    got = np.asarray(fill_depressions(dem, no_data=-9999.0))
    want = priority_flood_fill(dem, no_data=-9999.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
    np.testing.assert_array_equal(got == -9999.0, dem == -9999.0)


def test_fill_float32():
    dem = synth.depression_dem(48, seed=1, dtype=np.float32)
    got = np.asarray(fill_depressions(dem))
    assert got.dtype == np.float32
    want = priority_flood_fill(dem.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fill_converges_and_reports():
    dem = synth.depression_dem(32, seed=2, dtype=np.float64)
    filled, iters, done = fill_depressions_info(dem)
    assert bool(done)
    assert int(iters) < 32  # sweeps, not O(diameter) Jacobi steps


def test_auto_epsilon_resolvable():
    dem = synth.depression_dem(32, seed=4, dtype=np.float32) + 1000.0
    eps = auto_epsilon(dem)
    assert np.float32(1000.0 + eps) > np.float32(1000.0)


def test_fill_idempotent():
    dem = synth.depression_dem(48, seed=6, dtype=np.float64)
    once = np.asarray(fill_depressions(dem))
    twice = np.asarray(fill_depressions(once))
    np.testing.assert_array_equal(once, twice)
