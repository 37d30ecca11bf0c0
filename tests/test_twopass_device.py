"""Device-consumer two-pass protocol tests (VERDICT r2 missing #1).

The [P1]/[P2] drivers now run their consumers ON DEVICE with only
O(perimeter) host data; these tests gate them against the oracle, the
in-core device ops, and (where built) the native C++ consumer — the
round-2 engine kept as the cross-validation gate.
"""

import numpy as np
import pytest

from richdem_tpu import oracle, synth

jnp = pytest.importorskip("jax.numpy")


@pytest.fixture(scope="module")
def mesh8():
    from richdem_tpu.parallel import make_mesh
    return make_mesh()  # 2 x 4 over the 8 virtual CPU devices


def _dem(n=96, seed=3, no_data=None):
    z = synth.depression_dem(n, seed=seed, dtype=np.float32)
    if no_data is not None:
        z = synth.with_nodata_holes(z, no_data=no_data)
    return z


# ---------------------------------------------------------------------------
# consumer internals
# ---------------------------------------------------------------------------

def test_fill_consumer_labels_are_ring_or_ocean():
    from richdem_tpu.parallel.consumer import fill_tile_consumer, ring_index
    z = _dem(72, seed=5)
    out = fill_tile_consumer(z, global_edges=0)
    lab = np.asarray(out["lab"])
    h, w = z.shape
    ring = np.zeros(h * w, bool)
    ring[ring_index(h, w)] = True
    # every non-ocean label is the premark (flat index + 1) of a ring cell
    labs = np.unique(lab)
    labs = labs[labs > 0]
    assert labs.size > 0
    assert ring[(labs - 1)].all()


def test_fill_consumer_edges_match_bruteforce():
    """Device edge extraction == exhaustive numpy label-pair reduction."""
    from richdem_tpu.parallel.consumer import fill_tile_consumer
    from richdem_tpu.parallel.labelgraph import reduce_edges
    from richdem_tpu.topology import DX, DY
    z = _dem(64, seed=9, no_data=-9999.0)
    out = fill_tile_consumer(z, no_data=-9999.0, global_edges=0)
    lab = np.asarray(out["lab"]).astype(np.int64)
    w_loc = np.asarray(out["w_loc"], np.float64)
    nd = z == -9999.0
    w_eff = np.where(nd, -np.inf, w_loc)
    h, w = z.shape
    ea, eb, ew = [], [], []
    for d in (5, 6, 7, 8):
        dy, dx = int(DY[d]), int(DX[d])
        for r in range(h):
            rr = r + dy
            if not (0 <= rr < h):
                continue
            for c in range(w):
                cc = c + dx
                if not (0 <= cc < w):
                    continue
                if lab[r, c] != lab[rr, cc]:
                    ea.append(lab[r, c])
                    eb.append(lab[rr, cc])
                    ew.append(max(w_eff[r, c], w_eff[rr, cc]))
    want = reduce_edges(np.array(ea), np.array(eb), np.array(ew))
    got = reduce_edges(*out["edges"])
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(got[2], want[2])


# ---------------------------------------------------------------------------
# out-of-core fill, device consumer
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("no_data", [None, -9999.0])
def test_outofcore_fill_device_consumer(tmp_path, no_data):
    from richdem_tpu.parallel.outofcore import out_of_core_fill
    dem = _dem(96, seed=4, no_data=no_data)
    p = str(tmp_path / "dem.npy")
    np.save(p, dem)
    stats = {}
    out = np.load(out_of_core_fill(p, tile=33, method="twopass",
                                   consumer="device", no_data=no_data,
                                   stats=stats))
    assert stats["data_passes"] == 2
    assert stats["consumer"] == "device"
    want = oracle.priority_flood_fill(dem.astype(np.float64),
                                      no_data=no_data)
    got = out.astype(np.float64)
    if no_data is not None:
        nd = dem == no_data
        np.testing.assert_array_equal(got[nd], no_data)
        np.testing.assert_allclose(got[~nd], want[~nd], rtol=0, atol=1e-5)
    else:
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_outofcore_fill_device_vs_native(tmp_path):
    """The native C++ consumer stays the gate (VERDICT r2 next #1a):
    both consumers must produce the identical filled raster."""
    from richdem_tpu import native
    if not native.available():
        pytest.skip("native engine not built")
    from richdem_tpu.parallel.outofcore import out_of_core_fill
    dem = _dem(80, seed=13)
    p = str(tmp_path / "dem.npy")
    np.save(p, dem)
    a = np.load(out_of_core_fill(p, str(tmp_path / "a.npy"), tile=25,
                                 method="twopass", consumer="device"))
    b = np.load(out_of_core_fill(p, str(tmp_path / "b.npy"), tile=25,
                                 method="twopass", consumer="native"))
    np.testing.assert_array_equal(a, b)


def test_outofcore_fill_device_no_label_raster(tmp_path):
    """Pass 1 persists nothing: no .labels.npy side file appears."""
    from richdem_tpu.parallel.outofcore import out_of_core_fill
    dem = _dem(64, seed=2)
    p = str(tmp_path / "dem.npy")
    np.save(p, dem)
    out_of_core_fill(p, tile=33, method="twopass", consumer="device")
    leftovers = [f.name for f in tmp_path.iterdir()
                 if "labels" in f.name]
    assert leftovers == []


# ---------------------------------------------------------------------------
# sharded two-pass (8 virtual devices)
# ---------------------------------------------------------------------------

def test_sharded_fill_twopass_device(mesh8):
    from richdem_tpu import ops
    from richdem_tpu.parallel.sharded import sharded_fill_twopass
    dem = _dem(96, seed=7)
    stats = {}
    got = np.asarray(sharded_fill_twopass(dem, mesh=mesh8, stats=stats))
    assert stats["data_passes"] == 2
    want = np.asarray(ops.fill_depressions(dem))
    np.testing.assert_array_equal(got, want)


def test_sharded_fill_twopass_uneven_nodata(mesh8):
    from richdem_tpu import ops
    from richdem_tpu.parallel.sharded import sharded_fill_twopass
    dem = _dem(91, seed=8, no_data=-9999.0)
    got = np.asarray(sharded_fill_twopass(dem, mesh=mesh8,
                                          no_data=-9999.0))
    want = np.asarray(ops.fill_depressions(dem, no_data=-9999.0))
    np.testing.assert_array_equal(got, want)


def test_sharded_accum_twopass_device(mesh8):
    from richdem_tpu.parallel.sharded import sharded_accumulation_d8_twopass
    dem = _dem(96, seed=11)
    filled = oracle.priority_flood_epsilon(dem.astype(np.float64),
                                           eps=1e-3)
    fd = oracle.d8_flowdirs(filled)
    stats = {}
    got = np.asarray(sharded_accumulation_d8_twopass(fd, mesh=mesh8,
                                                     stats=stats))
    assert stats["data_passes"] == 2
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sharded_accum_twopass_serpentine_uneven(mesh8):
    """Worst case: one flow path threading every cell, uneven grid."""
    from richdem_tpu.parallel.sharded import sharded_accumulation_d8_twopass
    h, w = 61, 77
    fd = np.zeros((h, w), np.int8)
    for r in range(h):
        if r % 2 == 0:
            fd[r, :] = 5
            fd[r, -1] = 7
        else:
            fd[r, :] = 1
            fd[r, 0] = 7
    fd[h - 1, 0 if (h - 1) % 2 else w - 1] = 0
    got = np.asarray(sharded_accumulation_d8_twopass(fd, mesh=mesh8))
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.max() == h * w


def test_sharded_accum_twopass_weights_nodata(mesh8):
    from richdem_tpu.parallel.sharded import sharded_accumulation_d8_twopass
    dem = _dem(64, seed=14, no_data=-9999.0)
    nd = dem == -9999.0
    filled = oracle.priority_flood_epsilon(dem, no_data=-9999.0, eps=1e-3,
                                           dtype=np.float64)
    fd = oracle.d8_flowdirs(filled, no_data=-9999.0)
    wts = np.full(dem.shape, 2.5, np.float32)
    got = np.asarray(sharded_accumulation_d8_twopass(
        fd, mesh=mesh8, weights=wts, no_data_mask=nd))
    want = oracle.d8_accumulation(fd, weights=np.where(nd, 0.0, wts))
    want[nd] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6)
