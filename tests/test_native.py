"""Native C++ engine ↔ Python oracle equivalence.

The backbone cross-validation pattern of the reference's test suite
(SURVEY.md §4: independent implementations compared exactly) applied to the
native engine: the C++ Priority-Flood/flowdirs/accumulation must reproduce
the heap-based Python oracle bit-for-bit on every fixture."""

import numpy as np
import pytest

from richdem_tpu import oracle, synth
from richdem_tpu.oracle import flowdirs as flowdirs_oracle
from richdem_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine did not build")


def _fixtures():
    return {
        "cone": synth.cone_dem(33, dtype=np.float64),
        "depressions": synth.depression_dem(48, seed=3, dtype=np.float64),
        "perlin": synth.perlin_dem(40, seed=7, dtype=np.float64),
        "plateau": synth.plateau_dem(32, dtype=np.float64),
        "holes": synth.with_nodata_holes(
            synth.depression_dem(48, seed=5, dtype=np.float64),
            no_data=-9999.0),
    }


@pytest.mark.parametrize("name", list(_fixtures()))
def test_fill_matches_oracle(name):
    dem = _fixtures()[name]
    nd = -9999.0 if name == "holes" else None
    got = native.fill(dem, no_data=nd)
    want = oracle.priority_flood_fill(dem, no_data=nd, dtype=np.float64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", ["depressions", "holes"])
def test_fill_epsilon_matches_oracle(name):
    dem = _fixtures()[name]
    nd = -9999.0 if name == "holes" else None
    got = native.fill(dem, no_data=nd, eps=1e-3)
    want = oracle.priority_flood_epsilon(dem, no_data=nd, eps=1e-3,
                                         dtype=np.float64)
    np.testing.assert_array_equal(got, want)


def test_fill_flowdirs_matches_oracle():
    dem = _fixtures()["depressions"]
    zf, fd = native.fill_flowdirs(dem)
    zo, fo = oracle.priority_flood_flowdirs(dem)
    np.testing.assert_array_equal(zf, zo.astype(np.float64))
    np.testing.assert_array_equal(fd, fo)


def test_fill_watersheds_matches_oracle():
    dem = _fixtures()["depressions"]
    zf, lb = native.fill_watersheds(dem)
    zo, lo = oracle.priority_flood_watersheds(dem)
    np.testing.assert_array_equal(zf, zo.astype(np.float64))
    np.testing.assert_array_equal(lb, lo)


@pytest.mark.parametrize("name", ["cone", "perlin", "holes"])
def test_d8_flowdirs_matches_oracle(name):
    dem = _fixtures()[name]
    nd = -9999.0 if name == "holes" else None
    filled = oracle.priority_flood_fill(dem, no_data=nd, dtype=np.float64)
    got = native.d8_flowdirs(filled, no_data=nd)
    want = oracle.d8_flowdirs(filled, no_data=nd)
    np.testing.assert_array_equal(got, want)


def test_d4_flowdirs_matches_oracle():
    dem = _fixtures()["cone"]
    got = native.d8_flowdirs(dem, topology="D4")
    want = oracle.d8_flowdirs(dem, topology="D4")
    np.testing.assert_array_equal(got, want)


def test_accum_d8_matches_oracle():
    dem = _fixtures()["perlin"]
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3, dtype=np.float64)
    fd = oracle.d8_flowdirs(filled)
    got = native.accum_d8(fd)
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # mass conservation: everything drains somewhere
    assert got.sum() > 0


def test_accum_props_matches_oracle():
    dem = _fixtures()["cone"]
    props = oracle.flow_proportions(dem, method="Quinn")
    got = native.accum_props(np.asarray(props, np.float64))
    want = oracle.flow_accumulation_from_props(props)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_accum_weighted():
    dem = _fixtures()["cone"]
    fd = oracle.d8_flowdirs(dem)
    w = np.full(dem.shape, 2.0)
    got = native.accum_d8(fd, weights=w)
    want = oracle.d8_accumulation(fd, weights=w)
    np.testing.assert_allclose(got, want)


def test_accum_cycle_raises():
    fd = np.zeros((4, 4), np.int8)
    fd[1, 1] = 5  # -> (1,2)
    fd[1, 2] = 1  # -> (1,1): 2-cycle
    with pytest.raises(ValueError, match="cycle"):
        native.accum_d8(fd)


def test_breach_matches_oracle():
    from richdem_tpu.oracle.breach import breach_depressions as ob
    dem = _fixtures()["depressions"]
    for mode, kw in [("Complete", {}),
                     ("Selective", dict(max_path_len=6)),
                     ("Constrained", dict(max_path_depth=2.0))]:
        got = native.breach_depressions(dem, mode=mode, eps=1e-3, **kw)
        want = ob(dem, mode=mode, eps=1e-3, **kw)
        np.testing.assert_array_equal(got, want)


def test_breach_nodata_matches_oracle():
    from richdem_tpu.oracle.breach import breach_depressions as ob
    dem = _fixtures()["holes"]
    got = native.breach_depressions(dem, no_data=-9999.0, eps=1e-3,
                                    fill_remainder=True)
    want = ob(dem, no_data=-9999.0, eps=1e-3, fill_remainder=True)
    np.testing.assert_array_equal(got, want)


def test_resolve_flats_matches_oracle():
    from richdem_tpu.oracle.flats import (resolve_flats as orf,
                                          flat_mask_and_labels as oml)
    dem = _fixtures()["plateau"]
    filled = oracle.priority_flood_fill(dem, dtype=np.float64)
    fd = oracle.d8_flowdirs(filled)
    got = native.resolve_flats(filled, fd)
    want = orf(filled, fd)
    np.testing.assert_array_equal(got, want)
    gm, gl = native.flat_mask_and_labels(filled, fd)
    wm, wl = oml(filled, fd)
    np.testing.assert_array_equal(gm, wm)
    # labels may be numbered differently only if discovery order differs;
    # both scan row-major, so require exact equality.
    np.testing.assert_array_equal(gl, wl)


@pytest.mark.parametrize("name", ["perlin", "holes"])
def test_dinf_flowdirs_matches_oracle(name):
    dem = _fixtures()[name]
    nd = -9999.0 if name == "holes" else None
    got = native.dinf_flowdirs(dem, no_data=nd)
    want = oracle.dinf_flowdirs(dem, no_data=nd)
    # identical double arithmetic up to libm ulp differences; the
    # NO_FLOW/nodata markers must match exactly
    np.testing.assert_allclose(got, want, atol=1e-12, rtol=0)
    np.testing.assert_array_equal(got < 0, want < 0)


def test_dinf_props_matches_oracle():
    dem = _fixtures()["perlin"]
    ang = oracle.dinf_flowdirs(dem)
    np.testing.assert_array_equal(native.dinf_props(ang),
                                  flowdirs_oracle.proportions_from_dinf(ang))


@pytest.mark.parametrize("exponent,method", [(1.0, "Quinn"),
                                             (1.1, "Freeman")])
def test_mfd_props_matches_oracle(exponent, method):
    dem = _fixtures()["holes"]
    got = native.mfd_props(dem, no_data=-9999.0, exponent=exponent)
    want = oracle.flow_proportions(dem, method=method, no_data=-9999.0,
                                   exponent=exponent)
    np.testing.assert_allclose(got, want, atol=1e-15, rtol=0)


def test_slope_radians_matches_oracle():
    dem = _fixtures()["holes"]
    got = native.slope_radians(dem, no_data=-9999.0)
    want = oracle.terrain_attribute(dem, "slope_radians", no_data=-9999.0)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    # math.hypot (CPython's own correctly-rounded variant) vs libm hypot
    # differ by <= 1 ulp on ~0.5% of cells; everything else is identical
    np.testing.assert_allclose(got[m], want[m], rtol=5e-16, atol=0)
