"""Orlandini 2003 D8-LTD/LAD oracle properties.

The reference was unreadable (SURVEY.md provenance), so these gate the
pinned semantics documented in oracle/orlandini.py: facet-consistent
directions, mass conservation under accumulation, and the λ=0 /
deviation-memory behaviors."""

import numpy as np
import pytest

from richdem_tpu import oracle, synth
from richdem_tpu.oracle.orlandini import orlandini_flowdirs
from richdem_tpu.topology import DX, DY


@pytest.fixture(scope="module")
def filled():
    dem = synth.perlin_dem(64, seed=8, dtype=np.float64)
    return oracle.priority_flood_epsilon(dem, eps=1e-3)


def test_directions_descend(filled):
    fd = orlandini_flowdirs(filled)
    h, w = filled.shape
    for r in range(h):
        for c in range(w):
            d = int(fd[r, c])
            if d <= 0:
                continue
            nr, nc = r + int(DY[d]), c + int(DX[d])
            assert filled[nr, nc] <= filled[r, c]


def test_mass_conservation(filled):
    fd = orlandini_flowdirs(filled)
    acc = oracle.d8_accumulation(fd, no_data_mask=np.zeros(fd.shape, bool))
    absorbed = acc[fd == 0].sum()
    assert absorbed == pytest.approx(filled.size)


def test_modes_and_lambda(filled):
    ltd = orlandini_flowdirs(filled, lam=1.0, mode="LTD")
    lad = orlandini_flowdirs(filled, lam=1.0, mode="LAD")
    l0 = orlandini_flowdirs(filled, lam=0.0)
    # all are valid drainage fields but the deviation memory changes paths
    assert (ltd != l0).any()
    for fd in (ltd, lad, l0):
        assert set(np.unique(fd)).issubset(set(range(0, 9)))


def test_nodata_propagates():
    dem = synth.with_nodata_holes(
        synth.depression_dem(48, seed=5, dtype=np.float64),
        no_data=-9999.0)
    fd = orlandini_flowdirs(dem, no_data=-9999.0)
    assert (fd[dem == -9999.0] == -1).all()
    assert (fd[dem != -9999.0] >= 0).all()


def test_cone_roughly_radial():
    dem = synth.cone_dem(33, dtype=np.float64)
    fd = orlandini_flowdirs(dem)
    # center peak: flow points outward → border cells accumulate all mass
    acc = oracle.d8_accumulation(fd)
    inner = acc[1:-1, 1:-1]
    assert acc.sum() >= dem.size  # every cell contributes
    assert inner.max() < dem.size / 4  # no giant inward funnel


def test_api_dispatch():
    import richdem_tpu as rd
    dem = synth.perlin_dem(48, seed=3, dtype=np.float32)
    out = rd.FlowDirections(rd.rdarray(dem), method="Orlandini")
    want = orlandini_flowdirs(dem.astype(np.float64))
    np.testing.assert_array_equal(np.asarray(out), want)
