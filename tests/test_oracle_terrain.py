"""Oracle terrain attributes: analytic surfaces with known derivatives."""

import numpy as np
import pytest

from richdem_tpu import synth
from richdem_tpu.oracle import terrain_attribute
from richdem_tpu.oracle.terrain import twi, spi


def test_slope_on_tilted_plane():
    y, x = np.mgrid[0:16, 0:16]
    z = (0.3 * x + 0.4 * y).astype(np.float64)
    s = terrain_attribute(z, "slope_riserun")
    np.testing.assert_allclose(s[1:-1, 1:-1], 0.5, atol=1e-12)
    np.testing.assert_allclose(
        terrain_attribute(z, "slope_percentage")[1:-1, 1:-1], 50.0)
    np.testing.assert_allclose(
        terrain_attribute(z, "slope_radians")[1:-1, 1:-1], np.arctan(0.5))
    np.testing.assert_allclose(
        terrain_attribute(z, "slope_degrees")[1:-1, 1:-1],
        np.degrees(np.arctan(0.5)))


def test_zscale_and_cellsize():
    y, x = np.mgrid[0:10, 0:10]
    z = (0.5 * x).astype(np.float64)
    s = terrain_attribute(z, "slope_riserun", zscale=2.0, cellsize=5.0)
    np.testing.assert_allclose(s[1:-1, 1:-1], 0.2, atol=1e-12)


@pytest.mark.parametrize("grad, expect", [
    ((1.0, 0.0), 270.0),   # rises east -> downslope west
    ((-1.0, 0.0), 90.0),   # rises west -> downslope east
    ((0.0, 1.0), 0.0),     # rises south -> downslope north
    ((0.0, -1.0), 180.0),  # rises north -> downslope south
    ((1.0, 1.0), 315.0),   # rises SE -> downslope NW
])
def test_aspect_compass_convention(grad, expect):
    gx, gy = grad
    y, x = np.mgrid[0:12, 0:12]
    z = (gx * x + gy * y).astype(np.float64)
    a = terrain_attribute(z, "aspect")
    np.testing.assert_allclose(a[1:-1, 1:-1], expect, atol=1e-9)


def test_aspect_flat_is_minus_one():
    z = np.full((8, 8), 3.0)
    assert np.all(terrain_attribute(z, "aspect") == -1.0)


def test_curvature_of_paraboloid():
    # z = -(x² + y²)/2 : convex hilltop.  The Z–T quadric coefficient D is
    # half the second derivative: D = E = -1/2, curvature = -2(D+E)·100
    # = +200 (positive = convex).
    y, x = np.mgrid[0:16, 0:16]
    z = -((x - 7.5) ** 2 + (y - 7.5) ** 2) / 2.0
    c = terrain_attribute(z, "curvature")
    np.testing.assert_allclose(c[1:-1, 1:-1], 200.0, atol=1e-9)
    # Bowl: opposite sign.
    c2 = terrain_attribute(-z, "curvature")
    np.testing.assert_allclose(c2[1:-1, 1:-1], -200.0, atol=1e-9)


def test_planform_and_profile_on_plane_are_zero():
    y, x = np.mgrid[0:10, 0:10]
    z = (0.3 * x + 0.7 * y).astype(np.float64)
    np.testing.assert_allclose(
        terrain_attribute(z, "planform_curvature")[1:-1, 1:-1], 0.0,
        atol=1e-9)
    np.testing.assert_allclose(
        terrain_attribute(z, "profile_curvature")[1:-1, 1:-1], 0.0,
        atol=1e-9)


def test_nodata_cells_are_nan():
    z = synth.perlin_dem(12, seed=0, dtype=np.float64)
    z[3, 4] = -9999.0
    s = terrain_attribute(z, "slope_riserun", no_data=-9999.0)
    assert np.isnan(s[3, 4])
    assert np.isfinite(s[0, 0])


def test_twi_spi_formulas():
    acc = np.array([[10.0]])
    slope = np.array([[np.arctan(0.5)]])
    np.testing.assert_allclose(twi(acc, slope), np.log(10.0 / 0.5))
    np.testing.assert_allclose(spi(acc, slope), 10.0 * 0.5)


def test_unknown_attribute_raises():
    with pytest.raises(ValueError, match="unknown terrain attribute"):
        terrain_attribute(np.zeros((4, 4)), "bogus")
