"""Scan-GS accumulation kernels ↔ oracle equivalence (interpret mode).

Same small-fold injection strategy as tests/test_pallas_folded.py; the
scan kernels' production-size TPU gates live in tests/test_tpu_only.py.
"""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu import oracle, synth
from richdem_tpu.ops import pallas_folded, pallas_scan

FOLD = dict(fold_min=8, fold_pad=64)


@pytest.fixture(autouse=True)
def _scan_test_mode():
    old_cap = pallas_folded._STRIP_CAP
    pallas_folded._STRIP_CAP = 16
    try:
        if jax.default_backend() != "tpu":
            with pltpu.force_tpu_interpret_mode():
                yield
        else:
            yield
    finally:
        pallas_folded._STRIP_CAP = old_cap
        pallas_scan._accum_scan_impl.clear_cache()
        pallas_scan._dinf_scan_impl.clear_cache()
        pallas_scan._mfd_scan_impl.clear_cache()
        pallas_scan._fill_scan_impl.clear_cache()


def _fd_of(dem):
    filled = oracle.priority_flood_epsilon(dem.astype(np.float64),
                                           eps=1e-3)
    return oracle.d8_flowdirs(filled)


@pytest.mark.parametrize("hw", [(64, 72), (96, 200), (70, 130)])
def test_scan_accum_matches_oracle(hw):
    dem = synth.depression_dem(hw[0], hw[1], seed=5, dtype=np.float32)
    fd = _fd_of(dem)
    got, iters, done = pallas_scan.d8_accumulation_scan(
        fd, return_info=True, **FOLD)
    assert bool(done)
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_scan_accum_serpentine_converges_fast():
    """One path threading every cell: E/W runs resolve in-row via the
    scan, so the whole serpentine needs only a couple of rotations
    (the 4-sweep folded kernels needed O(1) too — the scan must not be
    worse) and stays exact."""
    h, w = 64, 72
    fd = np.zeros((h, w), np.int8)
    for r in range(h):
        if r % 2 == 0:
            fd[r, :] = 5
            fd[r, -1] = 7
        else:
            fd[r, :] = 1
            fd[r, 0] = 7
    fd[h - 1, 0 if (h - 1) % 2 else w - 1] = 0
    got, iters, done = pallas_scan.d8_accumulation_scan(
        fd, return_info=True, **FOLD)
    assert bool(done)
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    assert float(np.asarray(got).max()) == h * w
    assert int(iters) <= 3


def test_scan_accum_weights_nodata():
    dem = synth.with_nodata_holes(
        synth.depression_dem(72, seed=6, dtype=np.float32),
        no_data=-9999.0)
    nd = dem == -9999.0
    filled = oracle.priority_flood_epsilon(dem, no_data=-9999.0,
                                           eps=1e-3, dtype=np.float64)
    fd = oracle.d8_flowdirs(filled, no_data=-9999.0)
    wts = np.full(dem.shape, 2.5, np.float32)
    got = np.asarray(pallas_scan.d8_accumulation_scan(
        fd, weights=wts, no_data_mask=nd, **FOLD), np.float64)
    want = oracle.d8_accumulation(fd, weights=np.where(nd, 0.0, wts))
    want[nd] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("rot", ["2", "4"])
def test_dinf_scan_matches_oracle(rot, monkeypatch):
    """The scan-GS two-tap D∞ kernel vs the oracle topological queue
    over the same quantized proportions — both the row-only (2-sweep)
    and the row+column (4-sweep, transposed packed field) rotations."""
    monkeypatch.setenv("RICHDEM_TPU_DINF_SCAN_ROT", rot)
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import (dinf_two_tap, pack_two_tap,
                                             two_tap_props,
                                             unpack_two_tap)
    dem = synth.perlin_dem(72, 96, seed=10, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    ang = dinf_flowdirs(np.asarray(filled, np.float32))
    code, p = dinf_two_tap(ang)
    got, iters, done = pallas_scan.dinf_accumulation_scan(
        code, p, return_info=True, **FOLD)
    assert bool(done)
    cq, pq = unpack_two_tap(pack_two_tap(code, p))
    want = oracle.flow_accumulation_from_props(
        np.asarray(two_tap_props(cq, pq), np.float64))
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=2e-5)
    assert abs(float(np.asarray(got).sum()) - want.sum()) \
        / want.sum() < 1e-6


def test_dinf_scan_weights_nodata():
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import (dinf_two_tap, pack_two_tap,
                                             two_tap_props,
                                             unpack_two_tap)
    dem = synth.with_nodata_holes(
        synth.depression_dem(72, seed=4, dtype=np.float32),
        no_data=-9999.0)
    nd = dem == -9999.0
    filled = oracle.priority_flood_epsilon(dem, no_data=-9999.0,
                                           eps=1e-3, dtype=np.float64)
    ang = dinf_flowdirs(np.asarray(filled, np.float32), no_data=None)
    ang = np.where(nd, -1.0, np.asarray(ang))
    code, p = dinf_two_tap(ang)
    wts = np.full(dem.shape, 1.5, np.float32)
    got = np.asarray(pallas_scan.dinf_accumulation_scan(
        code, p, weights=wts, no_data_mask=nd, **FOLD), np.float64)
    cq, pq = unpack_two_tap(pack_two_tap(code, p))
    want = oracle.flow_accumulation_from_props(
        np.asarray(two_tap_props(cq, pq), np.float64),
        weights=np.where(nd, 0.0, wts))
    want[nd] = 0.0
    np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.parametrize("method,kw", [
    ("Quinn", {}), ("Freeman", {}), ("Holmgren", {"exponent": 2.0})])
def test_mfd_scan_matches_oracle(method, kw):
    from richdem_tpu.ops.flowdirs import flow_proportions
    dem = synth.depression_dem(72, 96, seed=7, dtype=np.float32)
    filled = oracle.priority_flood_epsilon(dem.astype(np.float64),
                                           eps=1e-3)
    props = flow_proportions(np.asarray(filled, np.float32),
                             method=method, **kw)
    got, iters, done = pallas_scan.mfd_accumulation_scan(
        props, return_info=True, **FOLD)
    assert bool(done)
    want = oracle.flow_accumulation_from_props(
        np.asarray(props, np.float64))
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=2e-5)


def test_mfd_scan_quinn_fewer_rotations():
    """Quinn was the convergence-bound case (~100 rotations at 2048²,
    VERDICT r2 weak #2): the 4-sweep scan rotation (row + column scans)
    must cut the ROTATION count at equal dispatches per rotation — its
    count is flat in grid size (~7) where the row-only variant and the
    folded engine grow with the diameter."""
    from richdem_tpu.ops import pallas_mfd
    from richdem_tpu.ops.flowdirs import flow_proportions
    dem = synth.perlin_dem(96, 128, seed=13, dtype=np.float32)
    filled = oracle.priority_flood_epsilon(dem.astype(np.float64),
                                           eps=1e-3)
    props = flow_proportions(np.asarray(filled, np.float32),
                             method="Quinn")
    _, it_scan, d1 = pallas_scan.mfd_accumulation_scan(
        props, return_info=True, **FOLD)
    _, it_fold, d2 = pallas_mfd.mfd_accumulation_gs(
        props, return_info=True, engine="folded", **FOLD)
    assert bool(d1) and bool(d2)
    assert int(it_scan) < int(it_fold)
    assert int(it_scan) <= 10


def test_scan_accum_fewer_dispatches_than_folded():
    """The whole point: a scan rotation is 2 pallas calls (vs the folded
    4 sweeps + 2 transpose refolds), so total kernel dispatches to
    convergence must drop even if rotation counts are close."""
    dem = synth.perlin_dem(96, seed=9, dtype=np.float32)
    fd = _fd_of(dem)
    _, it_scan, d1 = pallas_scan.d8_accumulation_scan(
        fd, return_info=True, **FOLD)
    _, it_fold, d2 = pallas_folded.d8_accumulation_folded(
        fd, return_info=True, **FOLD)
    assert bool(d1) and bool(d2)
    assert int(it_scan) * 2 < int(it_fold) * 6


# ---------------------------------------------------------------------------
# Scan-GS fill
# ---------------------------------------------------------------------------

def serpentine_pit(n, dtype=np.float32):
    """Walled serpentine pit, fully inset from the boundary; the only
    outlet is a notch at (0,1) above the path start (1,1).  The channel
    DESCENDS along the path, so the ε-fill level must chain cell by cell
    from the notch along the whole path — the adversarial case for
    fill-sweep convergence (the folded engine resolves ~2 runs per
    rotation; the scan's in-row chains chase the whole path per sweep)."""
    z = np.full((n, n), 1e6, dtype)
    z[0, 1] = 0.5
    val = 0.0
    for k, r in enumerate(range(1, n - 1, 2)):
        cols = (range(1, n - 1) if k % 2 == 0 else range(n - 2, 0, -1))
        for c in cols:
            z[r, c] = val
            val -= 1.0
        if r + 2 < n - 1:
            z[r + 1, (n - 2) if k % 2 == 0 else 1] = val
            val -= 1.0
    return z


@pytest.mark.parametrize("hw,eps", [
    ((64, 72), 0.0), ((64, 72), 1e-3),
    ((96, 200), 0.0), ((96, 200), 1e-3), ((70, 130), 1e-3)])
def test_fill_scan_matches_folded(hw, eps):
    dem = synth.depression_dem(hw[0], hw[1], seed=5, dtype=np.float32)
    got, it_s, d_s = pallas_scan.fill_fixpoint_scan(
        dem, eps=eps, multiscale=False, **FOLD)
    want, it_f, d_f = pallas_folded.fill_fixpoint_folded(
        dem, eps=eps, multiscale=False, **FOLD)
    assert bool(d_s) and bool(d_f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-4)


def test_fill_scan_matches_oracle_nodata():
    dem = synth.with_nodata_holes(
        synth.depression_dem(96, 128, seed=42, dtype=np.float64),
        no_data=-9999.0)
    nd = dem == -9999.0
    want = np.asarray(oracle.priority_flood_fill(dem, no_data=-9999.0))
    got, _, done = pallas_scan.fill_fixpoint_scan(
        np.asarray(dem, np.float32), nodata_mask=nd, multiscale=False,
        **FOLD)
    assert bool(done)
    g = np.asarray(got)
    np.testing.assert_allclose(g[~nd], want[~nd], atol=1e-4)
    np.testing.assert_allclose(g[nd], np.asarray(dem)[nd])


def test_fill_scan_serpentine_pit_converges_fast():
    """The structural claim: on the walled-serpentine pit the scan fill
    converges in O(vertical alternation) rotations (~2) where the folded
    engine needs ~n/4; with 2 vs 6 dispatches per rotation the dispatch
    ratio must exceed 10×.  Also the exactness gate vs the float64
    oracle."""
    n = 64
    dem = serpentine_pit(n)
    want = np.asarray(oracle.priority_flood_epsilon(
        dem.astype(np.float64), eps=1e-3))
    got_s, it_s, d_s = pallas_scan.fill_fixpoint_scan(
        dem, eps=1e-3, multiscale=False, max_iters=256, **FOLD)
    got_f, it_f, d_f = pallas_folded.fill_fixpoint_folded(
        dem, eps=1e-3, multiscale=False, max_iters=256, **FOLD)
    assert bool(d_s) and bool(d_f)
    np.testing.assert_allclose(np.asarray(got_s), want, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_f), want, atol=1e-2)
    assert int(it_s) <= 4
    assert int(it_s) * 2 * 10 <= int(it_f) * 6


def test_fill_scan_multiscale_warm_start():
    """The multigrid upper bound composes with the scan sweeps."""
    dem = synth.depression_dem(96, 128, seed=11, dtype=np.float32)
    got, _, done = pallas_scan.fill_fixpoint_scan(
        dem, eps=1e-3, multiscale=True, multiscale_min=64, **FOLD)
    want, _, _ = pallas_folded.fill_fixpoint_folded(
        dem, eps=1e-3, multiscale=False, **FOLD)
    assert bool(done)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-4)


def test_fill_engine_env_dispatch(monkeypatch):
    """RICHDEM_TPU_FILL_ENGINE routes fill_fixpoint_pallas."""
    dem = synth.depression_dem(64, 72, seed=5, dtype=np.float32)
    monkeypatch.setenv("RICHDEM_TPU_FILL_ENGINE", "scan")
    got = pallas_folded.fill_fixpoint_pallas(
        dem, eps=1e-3, multiscale=False, **FOLD)[0]
    monkeypatch.setenv("RICHDEM_TPU_FILL_ENGINE", "folded")
    want = pallas_folded.fill_fixpoint_pallas(
        dem, eps=1e-3, multiscale=False, **FOLD)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-4)


# ---------------------------------------------------------------------------
# Truncated scan depth (RICHDEM_TPU_SCAN_DEPTH)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("depth", [32])
def test_scan_accum_truncated_depth_serpentine_exact(depth, monkeypatch):
    """Truncating the prefix scans drops log2(W/depth) doubling steps
    per sweep; chains LONGER than the depth (the full-width serpentine
    runs here) must resolve over extra rotations via the old-value seed
    and still land on the exact fixpoint (equality convergence).
    (depth=8 works too but needs ~path/depth ≈ 300 rotations on this
    adversarial case — the documented trade, too slow for interpret
    mode; the depression-DEM tests below cover depth=8.)"""
    monkeypatch.setenv("RICHDEM_TPU_SCAN_DEPTH", str(depth))
    h, w = 64, 72
    fd = np.zeros((h, w), np.int8)
    for r in range(h):
        if r % 2 == 0:
            fd[r, :] = 5
            fd[r, -1] = 7
        else:
            fd[r, :] = 1
            fd[r, 0] = 7
    fd[h - 1, 0 if (h - 1) % 2 else w - 1] = 0
    got, iters, done = pallas_scan.d8_accumulation_scan(
        fd, return_info=True, max_rotations=256, **FOLD)
    assert bool(done)
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    assert float(np.asarray(got).max()) == h * w


@pytest.mark.parametrize("depth", [1, 8])
def test_mfd_scan_truncated_depth_exact(depth, monkeypatch):
    """Fractional gates (Quinn) under a truncated scan: the chain-seed
    argument holds for any downhill flow field, so the result must stay
    oracle-exact.  depth=1 exercises the fused one-shift lateral tap."""
    monkeypatch.setenv("RICHDEM_TPU_SCAN_DEPTH", str(depth))
    from richdem_tpu.ops.flowdirs import flow_proportions
    dem = synth.depression_dem(72, 96, seed=7, dtype=np.float32)
    filled = oracle.priority_flood_epsilon(dem.astype(np.float64),
                                           eps=1e-3)
    props = flow_proportions(np.asarray(filled, np.float32),
                             method="Quinn")
    got, iters, done = pallas_scan.mfd_accumulation_scan(
        props, return_info=True, max_rotations=256, **FOLD)
    assert bool(done)
    want = oracle.flow_accumulation_from_props(
        np.asarray(props, np.float64))
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=2e-5)


@pytest.mark.parametrize("depth", [1, 8])
def test_dinf_scan_truncated_depth_exact(depth, monkeypatch):
    """Truncated D∞: the seeded update regroups the f32 chain sums in a
    different order than the full-width scan, so its equality fixpoint
    sits a few hundred ulps from the f64 oracle (measured ≤3e-4 rel on
    0.2% of cells) — a float-regroup artifact, not a topology error."""
    monkeypatch.setenv("RICHDEM_TPU_SCAN_DEPTH", str(depth))
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import dinf_two_tap
    dem = synth.depression_dem(64, 80, seed=11, dtype=np.float32)
    filled = np.asarray(oracle.priority_flood_epsilon(
        dem.astype(np.float64), eps=1e-3), np.float32)
    ang = dinf_flowdirs(filled)
    code, p = dinf_two_tap(ang)
    got, iters, done = pallas_scan.dinf_accumulation_scan(
        code, p, return_info=True, max_rotations=256, **FOLD)
    assert bool(done)
    from richdem_tpu.ops.pallas_dinf import two_tap_props
    want = oracle.flow_accumulation_from_props(
        np.asarray(two_tap_props(code, p), np.float64))
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("depth", [1, 8])
def test_scan_accum_truncated_depth_exact(depth, monkeypatch):
    """Natural terrain has short in-row runs, so even tiny depths
    converge quickly and exactly (depth=1 degenerates to a one-step
    Jacobi in-row update)."""
    monkeypatch.setenv("RICHDEM_TPU_SCAN_DEPTH", str(depth))
    dem = synth.depression_dem(64, 72, seed=5, dtype=np.float32)
    fd = _fd_of(dem)
    got, iters, done = pallas_scan.d8_accumulation_scan(
        fd, return_info=True, max_rotations=256, **FOLD)
    assert bool(done)
    want = oracle.d8_accumulation(fd)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


@pytest.mark.parametrize("depth", [16])
def test_fill_scan_truncated_depth_exact(depth, monkeypatch):
    """Truncated clamp scans (old-value window seeds): the serpentine
    pit's full-width lateral chains resolve over extra rotations and
    the fill still lands on the float64-oracle surface."""
    monkeypatch.setenv("RICHDEM_TPU_SCAN_DEPTH", str(depth))
    n = 64
    dem = serpentine_pit(n)
    want = np.asarray(oracle.priority_flood_epsilon(
        dem.astype(np.float64), eps=1e-3))
    got, iters, done = pallas_scan.fill_fixpoint_scan(
        dem, eps=1e-3, multiscale=False, max_iters=256, **FOLD)
    assert bool(done)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-2)
    # natural terrain too (nodata drains)
    dem2 = synth.with_nodata_holes(
        synth.depression_dem(96, 128, seed=42, dtype=np.float64),
        no_data=-9999.0)
    nd = dem2 == -9999.0
    want2 = np.asarray(oracle.priority_flood_fill(dem2, no_data=-9999.0))
    got2, _, done2 = pallas_scan.fill_fixpoint_scan(
        np.asarray(dem2, np.float32), nodata_mask=nd, multiscale=False,
        max_iters=256, **FOLD)
    assert bool(done2)
    np.testing.assert_allclose(np.asarray(got2)[~nd], want2[~nd],
                               atol=1e-4)


@pytest.mark.parametrize("depth", [16])
def test_dist_scan_truncated_depth_exact(depth, monkeypatch):
    """Truncated tropical scans on the flat-resolution distance
    fixpoints: min-plus window seeds are exactly consistent at the
    fixpoint, so the masked distances must equal the full-scan ones."""
    import jax.numpy as jnp
    from richdem_tpu.ops import flats as F
    monkeypatch.setenv("RICHDEM_TPU_SCAN_DEPTH", str(depth))
    dem = synth.plateau_dem(72, dtype=np.float64)
    fd = oracle.d8_flowdirs(dem)
    want_fd = oracle.resolve_flats(dem, fd)
    nd = jnp.zeros(dem.shape, bool)
    got_fd, got_mask, _, _ = F._resolve_impl_pallas(
        jnp.asarray(dem), jnp.asarray(fd), nd, 256,
        engine="scan", fold_pad=64, scan_depth=depth)
    np.testing.assert_array_equal(np.asarray(got_fd), want_fd)
    exact_fd, exact_mask, _, _ = F._resolve_impl(
        jnp.asarray(dem), jnp.asarray(fd), nd, 256)
    np.testing.assert_array_equal(np.asarray(got_mask),
                                  np.asarray(exact_mask))


def test_dinf_scan_planes_route_matches_two_tap(monkeypatch):
    """RICHDEM_TPU_DINF_SCAN_PLANES routes the D-infinity scan engine
    through the generic MFD planes kernel; the result must match the
    packed two-tap kernel (same fixpoint, different sweep shape)."""
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import dinf_two_tap
    dem = synth.perlin_dem(72, 96, seed=10, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    ang = dinf_flowdirs(np.asarray(filled, np.float32))
    code, p = dinf_two_tap(ang)
    want, _, d1 = pallas_scan.dinf_accumulation_scan(
        code, p, return_info=True, **FOLD)
    monkeypatch.setenv("RICHDEM_TPU_DINF_SCAN_PLANES", "1")
    got, _, d2 = pallas_scan.dinf_accumulation_scan(
        code, p, return_info=True, **FOLD)
    assert bool(d1) and bool(d2)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.asarray(want, np.float64), rtol=2e-5)
