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


def test_twopass_is_exactly_two_passes(tmp_path):
    """[P1] contract: the label-graph fill reads the data exactly twice
    at ANY scale — even when one depression spans every tile (where the
    Schwarz iteration needs one pass per tile-crossing of the flood)."""
    h = w = 96
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    dem = 100.0 - 0.5 * np.hypot(y - 48, x - 48).astype(np.float32)
    dem[0, :] = dem[-1, :] = dem[:, 0] = dem[:, -1] = 100.0  # rim
    dem[0, 10] = 55.0  # single outlet notch
    p = str(tmp_path / "pit.npy")
    np.save(p, dem)
    stats = {}
    out = np.load(out_of_core_fill(p, tile=24, method="twopass",
                                   stats=stats))
    assert stats["method"] == "twopass"
    assert stats["data_passes"] == 2           # THE protocol guarantee
    n_tiles = 4 * 4
    assert stats["tile_loads"] == 2 * n_tiles  # pass 1 + apply pass
    want = oracle.priority_flood_fill(dem.astype(np.float64))
    np.testing.assert_allclose(out, want, rtol=0, atol=1e-5)
    # Schwarz needs strictly more traffic on this topology
    stats2 = {}
    p2 = str(tmp_path / "pit2.npy")
    out2 = np.load(out_of_core_fill(p, state_path=p2, tile=24,
                                    method="schwarz", stats=stats2))
    np.testing.assert_array_equal(out, out2)
    assert stats2["data_passes"] > 2


def test_twopass_nodata_islands(tmp_path):
    """Nodata pockets act as drains for their surrounding cells across
    tile seams (the cross-seam data→nodata edge case)."""
    dem = synth.depression_dem(80, seed=13, dtype=np.float32)
    dem[30:50, 30:50] = -9999.0  # hole spanning a 2x2 tile corner at t=40
    p = str(tmp_path / "dem.npy")
    np.save(p, dem)
    out = np.load(out_of_core_fill(p, tile=40, no_data=-9999.0,
                                   method="twopass"))
    want = oracle.priority_flood_fill(dem, no_data=-9999.0,
                                      dtype=np.float64)
    m = dem != -9999.0
    np.testing.assert_allclose(out[m], want[m], rtol=0, atol=1e-5)
    assert (out[~m] == -9999.0).all()


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


def test_accum_twopass_serpentine_two_passes(tmp_path):
    """[P2] contract: one serpentine flow path threading EVERY cell (and
    crossing tile seams ~h·w/tile times) — the two-pass protocol still
    reads the data exactly twice; the Schwarz engine must agree."""
    from richdem_tpu.parallel.outofcore import out_of_core_accum_d8
    h, w = 64, 64
    fd = np.zeros((h, w), np.int8)
    for r in range(h):
        if r % 2 == 0:
            fd[r, :] = 5              # east
            fd[r, -1] = 7             # south at the east wall
        else:
            fd[r, :] = 1              # west
            fd[r, 0] = 7              # south at the west wall
    fd[h - 1, 0 if (h - 1) % 2 else w - 1] = 0  # single terminal
    p = str(tmp_path / "serp.npy")
    np.save(p, fd)
    stats = {}
    out = np.load(out_of_core_accum_d8(p, tile=24, method="twopass",
                                       stats=stats))
    assert stats["data_passes"] == 2
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(out, want, rtol=1e-6)
    assert out.max() == h * w  # the single path accumulates every cell
    stats2 = {}
    p2 = str(tmp_path / "serp.acc2.npy")
    out2 = np.load(out_of_core_accum_d8(p, out_path=p2, tile=24,
                                        method="schwarz", stats=stats2))
    np.testing.assert_array_equal(out, out2)
    assert stats2["data_passes"] >= 2


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
