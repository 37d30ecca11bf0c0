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
    # 65 rows over 2 shards, 68 cols over 4 shards: padding-free shard_map
    # requires divisibility; document behavior — jax pads? It errors.
    dem = synth.depression_dem(64, seed=2, dtype=np.float64)[:64, :64]
    out = np.asarray(sharded_fill(dem, mesh=mesh8))
    assert out.shape == (64, 64)
