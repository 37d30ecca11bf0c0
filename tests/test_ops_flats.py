"""Device flat resolution vs oracle — resolved flow directions must match
bitwise (BFS levels == min-plus fixpoint levels)."""

import numpy as np
import pytest

from richdem_tpu import synth, oracle
from richdem_tpu.ops.flats import resolve_flats
from richdem_tpu.topology import NO_FLOW


DEMS = {
    "plateau": lambda: synth.plateau_dem(32, dtype=np.float64),
    "plateau_large_margin": lambda: synth.plateau_dem(40, margin=8,
                                                      dtype=np.float64),
    "filled_depressions": lambda: oracle.priority_flood_fill(
        synth.depression_dem(40, seed=3, dtype=np.float64)),
    "filled_perlin": lambda: oracle.priority_flood_fill(
        synth.perlin_dem(40, seed=9, dtype=np.float64)),
}


@pytest.mark.parametrize("name", sorted(DEMS))
def test_matches_oracle_bitwise(name):
    dem = DEMS[name]()
    fd = oracle.d8_flowdirs(dem)
    got = np.asarray(resolve_flats(dem, fd))
    want = oracle.resolve_flats(dem, fd)
    np.testing.assert_array_equal(got, want)


def test_no_flats_noop():
    dem = synth.cone_dem(33, dtype=np.float64)
    fd = oracle.d8_flowdirs(dem)
    got = np.asarray(resolve_flats(dem, fd))
    np.testing.assert_array_equal(got, fd)


def test_nodata_flats():
    dem = synth.plateau_dem(32, dtype=np.float64)
    dem = synth.with_nodata_holes(dem, no_data=-9999.0, seed=2, n_holes=1,
                                  max_radius=3)
    fd = oracle.d8_flowdirs(dem, no_data=-9999.0)
    got = np.asarray(resolve_flats(dem, fd, no_data=-9999.0))
    want = oracle.resolve_flats(dem, fd, no_data=-9999.0)
    np.testing.assert_array_equal(got, want)


def test_resolved_fills_drain():
    """Post-fill + resolve, only border/edge outlet cells keep NO_FLOW."""
    dem = oracle.priority_flood_fill(
        synth.depression_dem(40, seed=5, dtype=np.float64))
    fd = np.asarray(resolve_flats(dem, oracle.d8_flowdirs(dem)))
    interior = fd[1:-1, 1:-1]
    assert (interior == NO_FLOW).sum() == 0


@pytest.mark.parametrize("engine", ["folded", "scan"])
def test_pallas_quasi_membership_matches_exact(engine):
    """The TPU resolve replaces the exact flat-membership flood with a
    local equal-z-neighbor predicate (see _resolve_impl_pallas's
    docstring for the proof sketch).  Resolved directions and masks must
    equal the oracle AND the exact-membership CPU implementation
    bitwise; the in_flat diagnostic may only be a superset.  Both
    distance engines (strip-sequential folded sweeps and the tropical
    scan kernels — exact small-integer arithmetic) must agree."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from richdem_tpu.ops import flats as F
    from richdem_tpu.ops import pallas_folded

    old_cap = pallas_folded._STRIP_CAP
    pallas_folded._STRIP_CAP = 16
    try:
        for dem in [synth.plateau_dem(72, dtype=np.float64),
                    oracle.priority_flood_fill(
                        synth.depression_dem(64, seed=5,
                                             dtype=np.float64))]:
            fd = oracle.d8_flowdirs(dem)
            want_fd = oracle.resolve_flats(dem, fd)
            nd = jnp.zeros(dem.shape, bool)
            exact_fd, exact_mask, exact_flat, _ = F._resolve_impl(
                jnp.asarray(dem), jnp.asarray(fd), nd, 256)
            with pltpu.force_tpu_interpret_mode():
                got_fd, got_mask, got_flat, _ = F._resolve_impl_pallas(
                    jnp.asarray(dem), jnp.asarray(fd), nd, 256,
                    engine=engine, fold_pad=64)
            np.testing.assert_array_equal(np.asarray(got_fd), want_fd)
            np.testing.assert_array_equal(np.asarray(got_fd),
                                          np.asarray(exact_fd))
            np.testing.assert_array_equal(np.asarray(got_mask),
                                          np.asarray(exact_mask))
            assert (np.asarray(exact_flat) <= np.asarray(got_flat)).all()
    finally:
        pallas_folded._STRIP_CAP = old_cap


@pytest.mark.parametrize("method", ["Dinf", "Quinn"])
def test_resolved_surface_drains_divergent_metrics(method):
    """The single elevation-increment mechanism subsumes the reference's
    ``flat_resolution_dinf`` variant (SURVEY.md §2.2): D∞ and MFD
    proportions computed ON the ResolveFlats surface route flow off
    every formerly-flat cell, and accumulation over them conserves mass.
    """
    import jax.numpy as jnp

    import richdem_tpu as rd
    from richdem_tpu import ops

    dem = synth.depression_dem(64, seed=3, dtype=np.float64)
    filled = np.asarray(ops.fill_depressions(dem, eps=0.0))  # flat lakes
    fd0 = np.asarray(ops.flowdirs.d8_flowdirs(jnp.asarray(filled)))
    flats = (fd0 == NO_FLOW)
    flats[0, :] = flats[-1, :] = flats[:, 0] = flats[:, -1] = False
    assert flats.sum() > 20, "fixture must actually contain flat lakes"

    resolved = rd.ResolveFlats(rd.rdarray(filled))
    props = np.asarray(ops.flow_proportions(jnp.asarray(np.asarray(
        resolved)), method=method))
    outflow = props.sum(-1)
    # every formerly-flat interior cell now sheds its full flow
    np.testing.assert_allclose(outflow[flats], 1.0, rtol=0, atol=1e-6)
    # and the flow field is globally consistent: total mass absorbed at
    # terminals equals the cell count
    acc = np.asarray(ops.flow_accumulation_from_props(props))
    absorbed = acc[outflow < 1e-9].sum()
    np.testing.assert_allclose(absorbed, dem.size, rtol=1e-6)
