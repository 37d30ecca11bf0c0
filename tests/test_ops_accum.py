"""Device accumulation (Jacobi fixpoint + D8 pointer doubling) vs oracle."""

import numpy as np
import pytest

from richdem_tpu import synth, oracle
from richdem_tpu.ops import flowdirs as fops
from richdem_tpu.ops.accum import (
    flow_accumulation_from_props, d8_accumulation, accumulation_jacobi_info,
)


def _filled_perlin(n=40, seed=11):
    dem = synth.perlin_dem(n, seed=seed, dtype=np.float64)
    return oracle.priority_flood_epsilon(dem, eps=1e-6)


@pytest.mark.parametrize("method", ["D8", "Dinf", "Quinn", "Freeman"])
def test_jacobi_matches_oracle(method):
    filled = _filled_perlin()
    props = oracle.flow_proportions(filled, method=method)
    got = np.asarray(flow_accumulation_from_props(props))
    want = oracle.flow_accumulation_from_props(props)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_jacobi_weighted():
    filled = _filled_perlin(seed=5)
    props = oracle.flow_proportions(filled, method="Dinf")
    w = np.random.default_rng(0).uniform(0.5, 2.0, filled.shape)
    got = np.asarray(flow_accumulation_from_props(props, weights=w))
    want = oracle.flow_accumulation_from_props(props, weights=w)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_jacobi_converges_quickly_on_cone():
    z = -synth.cone_dem(33, dtype=np.float64)  # all paths -> center
    props = oracle.flow_proportions(z, method="D8")
    acc, iters, done = accumulation_jacobi_info(props)
    assert bool(done)
    want = oracle.flow_accumulation_from_props(props)
    np.testing.assert_allclose(np.asarray(acc), want, rtol=1e-9)


def test_d8_doubling_matches_oracle():
    filled = _filled_perlin(seed=17)
    fd = oracle.resolve_flats(filled, oracle.d8_flowdirs(filled))
    got = np.asarray(d8_accumulation(fd))
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_d8_doubling_weighted_and_nodata():
    dem = synth.perlin_dem(40, seed=23, dtype=np.float64)
    dem = synth.with_nodata_holes(dem, no_data=-9999.0, seed=3, n_holes=2)
    nd = dem == -9999.0
    filled = oracle.priority_flood_epsilon(dem, no_data=-9999.0, eps=1e-6)
    fd = oracle.d8_flowdirs(filled, no_data=-9999.0)
    w = np.full(dem.shape, 3.0)
    got = np.asarray(d8_accumulation(fd, weights=w, no_data_mask=nd))
    want = oracle.d8_accumulation(fd, weights=np.where(nd, 0, w),
                                  no_data_mask=nd)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_device_pipeline_matches_oracle_pipeline():
    """fill -> flowdirs -> accum entirely on device == entirely in oracle."""
    from richdem_tpu.ops.fill import fill_depressions
    dem = synth.depression_dem(48, seed=31, dtype=np.float64)
    f_dev = fill_depressions(dem, eps=1e-6)
    fd_dev = fops.d8_flowdirs(f_dev)
    acc_dev = d8_accumulation(fd_dev)

    f_or = oracle.priority_flood_epsilon(dem, eps=1e-6)
    fd_or = oracle.d8_flowdirs(f_or)
    acc_or = oracle.d8_accumulation(fd_or)

    np.testing.assert_allclose(np.asarray(f_dev), f_or, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(fd_dev), fd_or)
    np.testing.assert_allclose(np.asarray(acc_dev), acc_or, rtol=1e-6)
