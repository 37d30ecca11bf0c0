"""Oracle Lindsay-2016-style breaching property tests."""

import numpy as np

from richdem_tpu import synth
from richdem_tpu.oracle import breach_depressions, pit_mask
from richdem_tpu.oracle.fill import priority_flood_fill


def test_complete_breaching_removes_depressions():
    dem = synth.depression_dem(48, seed=3, dtype=np.float64)
    assert pit_mask(dem).any()
    breached = breach_depressions(dem, mode="Complete", eps=1e-6)
    # After breaching, filling is (near-)identity: no depressions remain.
    filled = priority_flood_fill(breached)
    np.testing.assert_allclose(filled, breached, atol=1e-9)


def test_breaching_only_lowers():
    dem = synth.depression_dem(32, seed=5, dtype=np.float64)
    breached = breach_depressions(dem, mode="Complete")
    assert np.all(breached <= dem + 1e-12)
    # Pit bottoms (strict interior local minima) are never modified —
    # the channel is carved outward from them, they are not raised.
    h, w = dem.shape
    interior = dem[1:-1, 1:-1]
    is_min = np.ones_like(interior, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == dx == 0:
                continue
            is_min &= interior < dem[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
    assert is_min.any()
    np.testing.assert_array_equal(breached[1:-1, 1:-1][is_min],
                                  interior[is_min])


def test_constrained_depth_limit():
    dem = synth.depression_dem(32, seed=7, dtype=np.float64)
    breached = breach_depressions(dem, mode="Constrained",
                                  max_path_depth=0.5, eps=1e-6)
    assert np.all(dem - breached <= 0.5 + 1e-9)


def test_selective_skips_long_paths_then_fill():
    dem = synth.depression_dem(32, seed=9, dtype=np.float64)
    out = breach_depressions(dem, mode="Selective", max_path_len=1,
                             fill_remainder=True, eps=1e-6)
    filled = priority_flood_fill(out)
    np.testing.assert_allclose(filled, out, atol=1e-9)


def test_nodata_preserved():
    dem = synth.depression_dem(32, seed=2, dtype=np.float64)
    dem = synth.with_nodata_holes(dem, no_data=-9999.0, seed=6, n_holes=2)
    breached = breach_depressions(dem, no_data=-9999.0)
    np.testing.assert_array_equal(breached == -9999.0, dem == -9999.0)
