"""Public API surface: pyrichdem-compatible names, provenance, round
trips against the oracle (SURVEY.md §2.5 contract)."""

import numpy as np
import pytest

import richdem_tpu as rd
from richdem_tpu import synth, oracle


@pytest.fixture()
def dem_rd():
    dem = synth.depression_dem(48, seed=3, dtype=np.float64)
    return rd.rdarray(dem, no_data=-9999.0,
                      geotransform=(500000.0, 30.0, 0.0, 4100000.0, 0.0,
                                    -30.0))


def test_fill_depressions_matches_oracle(dem_rd):
    out = rd.FillDepressions(dem_rd)
    np.testing.assert_allclose(
        out.np(), oracle.priority_flood_fill(dem_rd.np()), atol=1e-9)
    assert "FillDepressions" in out.metadata["PROCESSING_HISTORY"]
    assert out.geotransform == dem_rd.geotransform


def test_fill_epsilon_true_strictly_drains(dem_rd):
    out = rd.FillDepressions(dem_rd, epsilon=True)
    z = out.np()
    # interior cells all have a strictly lower neighbor
    h, w = z.shape
    lower = np.zeros((h - 2, w - 2), bool)
    inner = z[1:-1, 1:-1]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == dx == 0:
                continue
            lower |= z[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx] < inner
    assert lower.all()


def test_fill_in_place(dem_rd):
    before = dem_rd.np().copy()
    ret = rd.FillDepressions(dem_rd, in_place=True)
    assert ret is dem_rd
    assert (dem_rd.np() >= before).all()


def test_fill_d4_topology():
    dem = synth.depression_dem(32, seed=7, dtype=np.float64)
    d8 = rd.FillDepressions(rd.rdarray(dem)).np()
    d4 = rd.FillDepressions(rd.rdarray(dem), topology="D4").np()
    # D4 drainage is more restrictive: fills at least as high as D8.
    assert (d4 >= d8 - 1e-12).all()
    with pytest.raises(ValueError):
        rd.FillDepressions(rd.rdarray(dem), topology="D16")


def test_flow_accumulation_methods(dem_rd):
    filled = rd.FillDepressions(dem_rd, epsilon=True)
    for method in ("D8", "Dinf", "Quinn", "Freeman"):
        acc = rd.FlowAccumulation(filled, method=method)
        a = acc.np()
        sel = a >= 0
        assert a[sel].max() > 100  # something accumulated
        assert acc.no_data == -1.0
    with pytest.raises(ValueError):
        rd.FlowAccumulation(filled, method="D9")


def test_flow_accumulation_matches_oracle(dem_rd):
    filled = rd.FillDepressions(dem_rd, epsilon=True)
    acc = rd.FlowAccumulation(filled, method="Dinf").np()
    props = oracle.flow_proportions(filled.np(), method="Dinf",
                                    no_data=-9999.0)
    want = oracle.flow_accumulation_from_props(
        props, no_data_mask=filled.nodata_mask())
    sel = ~filled.nodata_mask()
    np.testing.assert_allclose(acc[sel], want[sel], rtol=1e-6)


def test_flow_proportions_shape(dem_rd):
    props = rd.FlowProportions(dem_rd, method="Quinn")
    assert props.shape == dem_rd.shape + (8,)
    sums = props.np().sum(axis=-1)
    assert ((np.isclose(sums, 1)) | (np.isclose(sums, 0))).all()


def test_flow_accum_from_props(dem_rd):
    filled = rd.FillDepressions(dem_rd, epsilon=True)
    props = rd.FlowProportions(filled, method="D8")
    acc = rd.FlowAccumFromProps(props)
    acc2 = rd.FlowAccumulation(filled, method="D8")
    sel = ~filled.nodata_mask()
    np.testing.assert_allclose(acc.np()[sel], acc2.np()[sel], rtol=1e-6)


def test_terrain_attribute(dem_rd):
    out = rd.TerrainAttribute(dem_rd, attrib="slope_riserun", zscale=2.0)
    want = oracle.terrain_attribute(dem_rd.np(), "slope_riserun",
                                    zscale=2.0, cellsize=30.0,
                                    no_data=-9999.0)
    sel = ~dem_rd.nodata_mask()
    np.testing.assert_allclose(out.np()[sel], want[sel], atol=1e-9)
    assert out.no_data == -9999.0


def test_resolve_flats_drains_plateau():
    dem = rd.rdarray(synth.plateau_dem(32, dtype=np.float64))
    resolved = rd.ResolveFlats(dem)
    fd = rd.FlowDirections(resolved, method="D8").np()
    assert (fd[1:-1, 1:-1] == 0).sum() == 0
    # outside flats the DEM is untouched
    orig_fd = oracle.d8_flowdirs(dem.np())
    changed = resolved.np() != dem.np()
    assert not changed[orig_fd > 0].any()


def test_breach_depressions(dem_rd):
    out = rd.BreachDepressions(dem_rd, eps=1e-6)
    sel = ~dem_rd.nodata_mask()
    assert (out.np()[sel] <= dem_rd.np()[sel] + 1e-12).all()
    filled = oracle.priority_flood_fill(out.np(), no_data=-9999.0)
    np.testing.assert_allclose(filled[sel], out.np()[sel], atol=1e-9)


def test_watersheds_and_strahler():
    dem = rd.rdarray(oracle.priority_flood_epsilon(
        synth.perlin_dem(40, seed=4, dtype=np.float64), eps=1e-6))
    labels = rd.WatershedLabels(dem).np()
    assert labels.shape == dem.shape
    fd = rd.FlowDirections(dem, method="D8")
    order = rd.StrahlerOrder(fd).np()
    assert order.min() >= 1 and order.max() >= 2


def test_upslope_cells():
    z = np.arange(6, dtype=np.float64)[None, :].repeat(3, axis=0)
    fd = rd.FlowDirections(rd.rdarray(z), method="D8")
    seeds = np.zeros((3, 6), bool)
    seeds[1, 2] = True
    up = rd.UpslopeCells(seeds, fd).np()
    assert up[1, 2] and up[1, 3] and not up[1, 1]


def test_twi_spi(dem_rd):
    filled = rd.FillDepressions(dem_rd, epsilon=True)
    acc = rd.FlowAccumulation(filled, method="Dinf")
    slope = rd.TerrainAttribute(filled, attrib="slope_radians")
    wet = rd.TWI(acc, slope.np())
    power = rd.SPI(acc, slope.np())
    sel = ~dem_rd.nodata_mask()
    assert np.isfinite(wet.np()[sel]).all()
    assert (power.np()[sel] >= 0).all()


def test_rd_compare(dem_rd):
    assert rd.rdCompare(dem_rd, dem_rd.copy())
    other = dem_rd.copy()
    arr = other.np()
    arr[10, 10] += 1.0
    assert not rd.rdCompare(dem_rd, other, verbose=False)
    assert rd.rdCompare(dem_rd, other, atol=2.0, verbose=False)


def test_processing_history_accumulates(dem_rd):
    a = rd.FillDepressions(dem_rd)
    b = rd.FlowAccumulation(a, method="D8")
    hist = b.metadata["PROCESSING_HISTORY"]
    assert "FillDepressions" in hist and "FlowAccumulation" in hist
    assert hist.index("FillDepressions") < hist.index("FlowAccumulation")
