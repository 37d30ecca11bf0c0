"""Parallel-vs-serial equivalence on an 8-virtual-device CPU mesh — the
reference's multi-node test strategy without a cluster (SURVEY.md §4
item 2): shard+halo results must equal the single-device op."""

import numpy as np
import pytest
import jax

from richdem_tpu import synth, oracle
from richdem_tpu.ops.fill import fill_depressions
from richdem_tpu.ops.flowdirs import d8_flowdirs
from richdem_tpu.ops.terrain import terrain_attribute
from richdem_tpu.ops.accum import d8_accumulation
from richdem_tpu.parallel import (
    make_mesh, sharded_fill, sharded_terrain_attribute,
    sharded_d8_flowdirs, sharded_accumulation_d8, sharded_pipeline,
)
from richdem_tpu.parallel.mesh import best_factorization


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh()  # 2 x 4


def test_best_factorization():
    assert best_factorization(8) == (2, 4)
    assert best_factorization(4) == (2, 2)
    assert best_factorization(7) == (1, 7)
    assert best_factorization(16) == (4, 4)


@pytest.mark.parametrize("eps", [0.0, 1e-3])
def test_sharded_fill_equals_single_device(mesh8, eps):
    dem = synth.depression_dem(64, seed=3, dtype=np.float64)
    single = np.asarray(fill_depressions(dem, eps=eps))
    sharded = np.asarray(sharded_fill(dem, mesh=mesh8, eps=eps))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_fill_twopass_equals_schwarz_and_oracle(mesh8):
    """[P1] label-graph fill over the mesh tiling: exactly 2 passes,
    identical output to the Schwarz sharded fill and the oracle."""
    from richdem_tpu.parallel.sharded import sharded_fill_twopass
    dem = synth.depression_dem(64, seed=3, dtype=np.float32)
    stats = {}
    two = np.asarray(sharded_fill_twopass(dem, mesh=mesh8, stats=stats))
    assert stats["data_passes"] == 2
    schwarz = np.asarray(sharded_fill(dem, mesh=mesh8, eps=0.0),
                         np.float32)
    np.testing.assert_array_equal(two, schwarz)
    want = oracle.priority_flood_fill(dem.astype(np.float64))
    np.testing.assert_allclose(two.astype(np.float64), want,
                               rtol=0, atol=1e-5)


def test_sharded_fill_twopass_nodata(mesh8):
    from richdem_tpu.parallel.sharded import sharded_fill_twopass
    dem = synth.with_nodata_holes(
        synth.depression_dem(64, seed=7, dtype=np.float32),
        no_data=-9999.0)
    nd = dem == -9999.0
    two = np.asarray(sharded_fill_twopass(dem, mesh=mesh8,
                                          no_data=-9999.0))
    want = oracle.priority_flood_fill(dem, no_data=-9999.0,
                                      dtype=np.float64)
    np.testing.assert_allclose(two[~nd].astype(np.float64), want[~nd],
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(two[nd], -9999.0)


def test_sharded_fill_with_nodata(mesh8):
    dem = synth.depression_dem(64, seed=9, dtype=np.float64)
    dem = synth.with_nodata_holes(dem, no_data=-9999.0, seed=1, n_holes=3)
    mask = dem == -9999.0
    single = np.asarray(fill_depressions(dem, no_data=-9999.0))
    sharded = np.asarray(sharded_fill(dem, mesh=mesh8, nodata_mask=mask))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_terrain_equals_single_device(mesh8):
    dem = synth.perlin_dem(64, seed=7, dtype=np.float64)
    for attrib in ("slope_riserun", "aspect", "curvature"):
        single = np.asarray(terrain_attribute(dem, attrib))
        sharded = np.asarray(sharded_terrain_attribute(dem, attrib,
                                                       mesh=mesh8))
        np.testing.assert_array_equal(sharded, single)


def test_sharded_flowdirs_equal_single_device(mesh8):
    dem = oracle.priority_flood_epsilon(
        synth.perlin_dem(64, seed=5, dtype=np.float64), eps=1e-6)
    single = np.asarray(d8_flowdirs(dem))
    sharded = np.asarray(sharded_d8_flowdirs(dem, mesh=mesh8))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_accum_equals_single_device(mesh8):
    dem = oracle.priority_flood_epsilon(
        synth.perlin_dem(64, seed=11, dtype=np.float64), eps=1e-6)
    fd = np.asarray(d8_flowdirs(dem))
    single = np.asarray(d8_accumulation(fd))
    sharded = np.asarray(sharded_accumulation_d8(fd, mesh=mesh8))
    np.testing.assert_allclose(sharded, single, rtol=1e-12)


def test_sharded_pipeline_end_to_end_vs_oracle(mesh8):
    """Config-5 shape: the full sharded pipeline reproduces the oracle."""
    dem = synth.depression_dem(64, seed=21, dtype=np.float64)
    out = sharded_pipeline(dem, mesh=mesh8, eps=1e-6)
    want_fill = oracle.priority_flood_epsilon(dem, eps=1e-6)
    np.testing.assert_allclose(np.asarray(out["filled"]), want_fill,
                               atol=1e-7)
    want_fd = oracle.d8_flowdirs(want_fill)
    np.testing.assert_array_equal(np.asarray(out["flowdirs"]), want_fd)
    want_acc = oracle.d8_accumulation(want_fd)
    np.testing.assert_allclose(np.asarray(out["accum"]), want_acc,
                               rtol=1e-9)


def test_uneven_mesh_shapes(mesh8):
    """Mesh-indivisible grids: pad-to-divisible with nodata padding
    (invisible, exactly like off-grid), crop back — every sharded op
    must equal its single-device counterpart on a 67x74 grid over the
    2x4 mesh (VERDICT r1 weak #5)."""
    dem = synth.depression_dem(67, 74, seed=2, dtype=np.float64)
    filled_s = np.asarray(sharded_fill(dem, mesh=mesh8, eps=1e-3))
    filled_1 = np.asarray(fill_depressions(dem, eps=1e-3))
    assert filled_s.shape == (67, 74)
    np.testing.assert_array_equal(filled_s, filled_1)

    fd_s = np.asarray(sharded_d8_flowdirs(filled_1, mesh=mesh8))
    fd_1 = np.asarray(d8_flowdirs(filled_1))
    np.testing.assert_array_equal(fd_s, fd_1)

    acc_s = np.asarray(sharded_accumulation_d8(fd_1, mesh=mesh8))
    acc_1 = np.asarray(d8_accumulation(fd_1))
    np.testing.assert_array_equal(acc_s, acc_1)

    sl_s = np.asarray(sharded_terrain_attribute(dem, "slope_radians",
                                                mesh=mesh8))
    sl_1 = np.asarray(terrain_attribute(dem, "slope_radians"))
    np.testing.assert_array_equal(sl_s, sl_1)


@pytest.mark.parametrize("method", ["Quinn", "Dinf"])
def test_sharded_mfd_accumulation_equals_single_device(mesh8, method):
    """Divergent-metric accumulation over the mesh == single device —
    beyond the reference's D8-only parallel program (SURVEY §5.7)."""
    from richdem_tpu.ops.accum import flow_accumulation_from_props
    from richdem_tpu.ops.flowdirs import flow_proportions
    from richdem_tpu.parallel.sharded import sharded_accumulation_mfd
    dem = synth.perlin_dem(64, seed=4, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    props = np.asarray(flow_proportions(
        jax.numpy.asarray(filled, jax.numpy.float32), method=method))
    single = np.asarray(flow_accumulation_from_props(props))
    shard = np.asarray(sharded_accumulation_mfd(props, mesh=mesh8))
    np.testing.assert_allclose(shard, single, rtol=2e-5, atol=1e-4)
    # mass conservation on the sharded result
    out = props.sum(-1)
    np.testing.assert_allclose(shard[out < 1e-9].sum(), dem.size,
                               rtol=1e-5)


def test_sharded_mfd_accumulation_uneven(mesh8):
    from richdem_tpu.ops.accum import flow_accumulation_from_props
    from richdem_tpu.ops.flowdirs import flow_proportions
    from richdem_tpu.parallel.sharded import sharded_accumulation_mfd
    dem = synth.perlin_dem(67, 74, seed=5, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    props = np.asarray(flow_proportions(
        jax.numpy.asarray(filled, jax.numpy.float32), method="Quinn"))
    single = np.asarray(flow_accumulation_from_props(props))
    shard = np.asarray(sharded_accumulation_mfd(props, mesh=mesh8))
    assert shard.shape == (67, 74)
    np.testing.assert_allclose(shard, single, rtol=2e-5, atol=1e-4)


def test_uneven_mesh_pipeline_and_twopass(mesh8):
    """End-to-end: sharded_pipeline and the two-pass fill on an uneven
    grid equal the single-device pipeline."""
    from richdem_tpu.parallel.sharded import sharded_fill_twopass
    dem = synth.depression_dem(65, 70, seed=9, dtype=np.float32)
    out = sharded_pipeline(dem, mesh=mesh8, eps=0.0)
    filled_1 = np.asarray(fill_depressions(dem, eps=0.0), np.float32)
    np.testing.assert_array_equal(np.asarray(out["filled"], np.float32),
                                  filled_1)
    fd_1 = np.asarray(d8_flowdirs(jax.numpy.asarray(filled_1)))
    np.testing.assert_array_equal(np.asarray(out["flowdirs"]), fd_1)
    np.testing.assert_array_equal(np.asarray(out["accum"]),
                                  np.asarray(d8_accumulation(fd_1)))
    two = np.asarray(sharded_fill_twopass(dem, mesh=mesh8), np.float32)
    np.testing.assert_array_equal(two, filled_1)


def test_sharded_accum_twopass_equals_schwarz_and_oracle(mesh8):
    """[P2] two-pass accumulation over the mesh tiling: exactly 2 local
    solves per tile, identical output to the Schwarz mesh path and the
    oracle queue — incl. a serpentine path threading every cell."""
    from richdem_tpu.parallel.sharded import sharded_accumulation_d8_twopass
    dem = synth.perlin_dem(64, seed=4, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    fd = oracle.d8_flowdirs(filled)
    stats = {}
    two = np.asarray(sharded_accumulation_d8_twopass(fd, mesh=mesh8,
                                                     stats=stats))
    assert stats["data_passes"] == 2
    schwarz = np.asarray(sharded_accumulation_d8(fd, mesh=mesh8))
    np.testing.assert_array_equal(two, schwarz)
    np.testing.assert_allclose(two, oracle.d8_accumulation(fd), rtol=1e-6)
    # serpentine worst case on an uneven grid
    h, w = 48, 52
    serp = np.zeros((h, w), np.int8)
    for r in range(h):
        serp[r, :] = 5 if r % 2 == 0 else 1
        serp[r, -1 if r % 2 == 0 else 0] = 7
    serp[h - 1, 0 if (h - 1) % 2 else w - 1] = 0
    got = np.asarray(sharded_accumulation_d8_twopass(serp, mesh=mesh8))
    np.testing.assert_allclose(got, oracle.d8_accumulation(serp),
                               rtol=1e-6)
    assert got.max() == h * w
