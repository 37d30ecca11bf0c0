"""Folded-row Pallas kernels ↔ oracle equivalence (seam coverage at
several widths/fold paddings).  Interpret mode on CPU, compiled on TPU."""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu import oracle, synth


@pytest.fixture(autouse=True)
def _interpret_off_tpu():
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("hw", [(64, 72), (96, 200), (70, 130)])
def test_fill_folded_matches_oracle(hw):
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    dem = synth.depression_dem(hw[0], hw[1], seed=3, dtype=np.float32)
    filled, _, done = fill_fixpoint_folded(dem, eps=1e-3)
    assert bool(done)
    want = oracle.priority_flood_epsilon(dem.astype(np.float64), eps=1e-3)
    np.testing.assert_allclose(np.asarray(filled, np.float64), want,
                               rtol=0, atol=1e-4)


def test_fill_folded_nodata_and_w0():
    import jax.numpy as jnp
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    dem = synth.with_nodata_holes(
        synth.depression_dem(80, seed=5, dtype=np.float32),
        no_data=-9999.0)
    m = dem == -9999.0
    filled, _, done = fill_fixpoint_folded(dem, nodata_mask=jnp.asarray(m))
    assert bool(done)
    want = oracle.priority_flood_fill(dem, no_data=-9999.0,
                                      dtype=np.float64)
    np.testing.assert_allclose(np.asarray(filled, np.float64)[~m],
                               want[~m], rtol=0, atol=1e-5)
    # w0 clamp: seeding with the converged surface stays fixed
    again, _, done2 = fill_fixpoint_folded(dem, nodata_mask=jnp.asarray(m),
                                           w0=filled)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(filled))


@pytest.mark.parametrize("hw", [(64, 72), (96, 200)])
def test_accum_folded_matches_oracle(hw):
    from richdem_tpu.ops.pallas_folded import d8_accumulation_folded
    dem = synth.perlin_dem(hw[0], hw[1], seed=4, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    fd = oracle.d8_flowdirs(filled)
    got = np.asarray(d8_accumulation_folded(fd), np.float64)
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_accum_folded_weighted_nodata():
    from richdem_tpu.ops.pallas_folded import d8_accumulation_folded
    dem = synth.with_nodata_holes(
        synth.depression_dem(64, seed=6, dtype=np.float32),
        no_data=-9999.0)
    nd = dem == -9999.0
    filled = oracle.priority_flood_epsilon(dem, no_data=-9999.0, eps=1e-3,
                                           dtype=np.float64)
    fd = oracle.d8_flowdirs(filled, no_data=-9999.0)
    w = np.full(dem.shape, 1.5)
    got = np.asarray(d8_accumulation_folded(fd, weights=w,
                                            no_data_mask=nd), np.float64)
    want = oracle.d8_accumulation(fd, weights=np.where(nd, 0.0, w))
    want[nd] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6)
