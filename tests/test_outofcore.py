"""Out-of-core tiled fill ↔ in-core / oracle equivalence (the
trillion-cell @offloadall analog, SURVEY.md §2.4)."""

import numpy as np

from richdem_tpu import oracle, synth
from richdem_tpu.parallel.outofcore import out_of_core_fill


def test_matches_oracle(tmp_path):
    dem = synth.depression_dem(100, seed=3, dtype=np.float32)
    p = str(tmp_path / "dem.npy")
    np.save(p, dem)
    out = np.load(out_of_core_fill(p, tile=32, eps=0.0))
    want = oracle.priority_flood_fill(dem.astype(np.float64))
    np.testing.assert_allclose(out, want, rtol=0, atol=1e-5)


def test_epsilon_and_nodata(tmp_path):
    dem = synth.with_nodata_holes(
        synth.depression_dem(96, seed=5, dtype=np.float32),
        no_data=-9999.0)
    p = str(tmp_path / "dem.npy")
    np.save(p, dem)
    out = np.load(out_of_core_fill(p, tile=40, eps=1e-3, no_data=-9999.0))
    want = oracle.priority_flood_epsilon(dem, no_data=-9999.0, eps=1e-3,
                                         dtype=np.float64)
    m = dem != -9999.0
    np.testing.assert_allclose(out[m], want[m], rtol=0, atol=1e-4)
    assert (out[~m] == -9999.0).all()


def test_tile_not_dividing_grid(tmp_path):
    dem = synth.perlin_dem(70, 90, seed=9, dtype=np.float32)
    p = str(tmp_path / "dem.npy")
    np.save(p, dem)
    out = np.load(out_of_core_fill(p, tile=33))
    want = oracle.priority_flood_fill(dem.astype(np.float64))
    np.testing.assert_allclose(out, want, rtol=0, atol=1e-5)


def test_accum_matches_oracle(tmp_path):
    from richdem_tpu.parallel.outofcore import out_of_core_accum_d8
    dem = synth.perlin_dem(100, seed=4, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    fd = oracle.d8_flowdirs(filled)
    p = str(tmp_path / "fd.npy")
    np.save(p, fd)
    out = np.load(out_of_core_accum_d8(p, tile=33))
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_accum_weights_nodata(tmp_path):
    from richdem_tpu.parallel.outofcore import out_of_core_accum_d8
    dem = synth.with_nodata_holes(
        synth.depression_dem(96, seed=5, dtype=np.float64),
        no_data=-9999.0)
    filled = oracle.priority_flood_epsilon(dem, no_data=-9999.0, eps=1e-3)
    fd = oracle.d8_flowdirs(filled, no_data=-9999.0)
    w = np.full(dem.shape, 2.0)
    pf = str(tmp_path / "fd.npy")
    pw = str(tmp_path / "w.npy")
    np.save(pf, fd)
    np.save(pw, w)
    out = np.load(out_of_core_accum_d8(pf, weights_path=pw, tile=40))
    want = oracle.d8_accumulation(fd, weights=np.where(fd < 0, 0.0, w))
    np.testing.assert_allclose(out, want, rtol=1e-6)
