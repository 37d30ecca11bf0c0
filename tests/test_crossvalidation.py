"""Randomized three-way cross-validation: oracle ↔ native C++ ↔ device.

The reference's backbone test pattern (SURVEY.md §4: independent
implementations compared exactly) run over a matrix of random fractal
terrains: the full fill→flowdirs→flats→accum chain must agree across all
three engines on every seed."""

import numpy as np
import pytest

from richdem_tpu import native, oracle, synth
from richdem_tpu import ops


@pytest.mark.parametrize("seed", range(8))
def test_three_way_pipeline(seed):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(48, 90))
    w = int(rng.integers(48, 90))
    dem = synth.perlin_dem(h, w, seed=seed,
                           base_period=int(rng.integers(8, 30)),
                           dtype=np.float64)
    if seed % 2:
        dem = synth.with_nodata_holes(dem, no_data=-9999.0, seed=seed,
                                      n_holes=2)
        nd = -9999.0
    else:
        nd = None

    # fill: oracle == native (bit), device allclose
    f_o = oracle.priority_flood_epsilon(dem, no_data=nd, eps=1e-3)
    f_n = native.fill(dem, no_data=nd, eps=1e-3)
    np.testing.assert_array_equal(f_o, f_n)
    f_d = np.asarray(ops.fill_depressions(dem.astype(np.float32),
                                          no_data=nd, eps=1e-3), np.float64)
    m = dem != nd if nd is not None else np.ones(dem.shape, bool)
    np.testing.assert_allclose(f_d[m], f_o[m], rtol=0, atol=1e-4)

    # flowdirs on the (identical) oracle fill
    fd_o = oracle.d8_flowdirs(f_o, no_data=nd)
    fd_n = native.d8_flowdirs(f_o, no_data=nd)
    np.testing.assert_array_equal(fd_o, fd_n)
    fd_d = np.asarray(ops.d8_flowdirs(f_o, no_data=nd))
    np.testing.assert_array_equal(fd_d, fd_o)

    # flats on the raw fill (plain fill leaves flats)
    f_plain = oracle.priority_flood_fill(dem, no_data=nd,
                                         dtype=np.float64)
    fdp = oracle.d8_flowdirs(f_plain, no_data=nd)
    r_o = oracle.resolve_flats(f_plain, fdp, no_data=nd)
    r_n = native.resolve_flats(f_plain, fdp, no_data=nd)
    np.testing.assert_array_equal(r_o, r_n)
    from richdem_tpu.ops.flats import resolve_flats as dev_flats
    r_d = np.asarray(dev_flats(f_plain, fdp, no_data=nd))
    np.testing.assert_array_equal(r_d, r_o)

    # accumulation: mass conservation + agreement (the oracle masks
    # fd<0 by default; give the device op the same mask)
    a_o = oracle.d8_accumulation(fd_o)
    a_n = native.accum_d8(fd_o)
    a_n[fd_o < 0] = 0.0  # native keeps nodata at weight 0 already
    np.testing.assert_allclose(a_n, a_o, rtol=0, atol=0)
    a_d = np.asarray(ops.d8_accumulation(fd_o, no_data_mask=fd_o < 0),
                     np.float64)
    np.testing.assert_allclose(a_d, a_o, rtol=1e-6)
    assert a_o[(fd_o == 0)].sum() == pytest.approx(int(m.sum()))
