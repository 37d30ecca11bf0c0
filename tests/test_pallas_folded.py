"""Folded-row Pallas kernels ↔ oracle equivalence.

Production dispatches the folded kernels only at edge ≥ 2048 (padding to
1024 multiples is prohibitive below that), so these tests inject small
fold thresholds (``fold_min``/``fold_pad``) and cap the strip height so
the REAL folded kernels — seams, strip carries, index-mapped adjacent
strips, and the multigrid warm start — execute in interpret mode on CPU
at oracle-checkable sizes.  TPU-side exact gates at production sizes live
in tests/test_tpu_only.py."""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu import oracle, synth
from richdem_tpu.ops import pallas_folded

from tests.reference_impls import strahler_numpy, terminal_labels

#: pad to 64 (8 sublanes × 8-fold) instead of 1024; threshold 8 so every
#: grid here takes the folded path.
FOLD = dict(fold_min=8, fold_pad=64)


@pytest.fixture(autouse=True)
def _folded_test_mode():
    """Interpret mode off-TPU + small strips so grids span many strips."""
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
        # the cap is read at trace time — drop traces so later tests
        # (production cap) never reuse these
        for fn in (pallas_folded._fill_folded_impl,
                   pallas_folded._accum_folded_impl,
                   pallas_folded.successor_resolve_folded,
                   pallas_folded.strahler_folded):
            fn.clear_cache()
        from richdem_tpu.ops import pallas_dinf, pallas_mfd
        pallas_mfd._mfd_gs_impl.clear_cache()
        pallas_dinf._dinf_gs_impl.clear_cache()


@pytest.mark.parametrize("hw", [(64, 72), (96, 200), (70, 130)])
def test_fill_folded_matches_oracle(hw):
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    dem = synth.depression_dem(hw[0], hw[1], seed=3, dtype=np.float32)
    filled, _, done = fill_fixpoint_folded(dem, eps=1e-3, **FOLD)
    assert bool(done)
    want = oracle.priority_flood_epsilon(dem.astype(np.float64), eps=1e-3)
    np.testing.assert_allclose(np.asarray(filled, np.float64), want,
                               rtol=0, atol=1e-4)


def test_fill_folded_multiscale_matches_oracle():
    """The multigrid warm start (production path at ≥4096²) yields the
    same fixpoint: the coarse block-max fill is a valid upper bound."""
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    dem = synth.depression_dem(96, 136, seed=11, dtype=np.float32,
                               n_pits=9)
    filled, _, done = fill_fixpoint_folded(dem, eps=1e-3, multiscale=True,
                                           multiscale_min=64, **FOLD)
    assert bool(done)
    want = oracle.priority_flood_epsilon(dem.astype(np.float64), eps=1e-3)
    np.testing.assert_allclose(np.asarray(filled, np.float64), want,
                               rtol=0, atol=1e-4)
    # plain (eps=0) fill through the multiscale path must be EXACT
    filled0, _, done0 = fill_fixpoint_folded(dem, eps=0.0, multiscale=True,
                                             multiscale_min=64, **FOLD)
    assert bool(done0)
    want0 = oracle.priority_flood_fill(dem, dtype=np.float64)
    np.testing.assert_array_equal(np.asarray(filled0, np.float64), want0)


def test_fill_folded_nodata_and_w0():
    import jax.numpy as jnp
    from richdem_tpu.ops.pallas_folded import fill_fixpoint_folded
    dem = synth.with_nodata_holes(
        synth.depression_dem(80, seed=5, dtype=np.float32),
        no_data=-9999.0)
    m = dem == -9999.0
    filled, _, done = fill_fixpoint_folded(dem, nodata_mask=jnp.asarray(m),
                                           **FOLD)
    assert bool(done)
    want = oracle.priority_flood_fill(dem, no_data=-9999.0,
                                      dtype=np.float64)
    np.testing.assert_allclose(np.asarray(filled, np.float64)[~m],
                               want[~m], rtol=0, atol=1e-5)
    # w0 clamp: seeding with the converged surface stays fixed
    again, _, done2 = fill_fixpoint_folded(dem, nodata_mask=jnp.asarray(m),
                                           w0=filled, **FOLD)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(filled))


@pytest.mark.parametrize("hw", [(64, 72), (96, 200)])
def test_accum_folded_matches_oracle(hw):
    from richdem_tpu.ops.pallas_folded import d8_accumulation_folded
    dem = synth.perlin_dem(hw[0], hw[1], seed=4, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    fd = oracle.d8_flowdirs(filled)
    got = np.asarray(d8_accumulation_folded(fd, **FOLD), np.float64)
    want = oracle.d8_accumulation(fd)
    # unit weights ⇒ every partial sum is a small integer: exact in f32
    np.testing.assert_array_equal(got, want)


def test_accum_folded_weighted_nodata():
    from richdem_tpu.ops.pallas_folded import d8_accumulation_folded
    dem = synth.with_nodata_holes(
        synth.depression_dem(64, seed=6, dtype=np.float32),
        no_data=-9999.0)
    nd = dem == -9999.0
    filled = oracle.priority_flood_epsilon(dem, no_data=-9999.0, eps=1e-3,
                                           dtype=np.float64)
    fd = oracle.d8_flowdirs(filled, no_data=-9999.0)
    w = np.full(dem.shape, 1.5)
    got = np.asarray(d8_accumulation_folded(fd, weights=w, no_data_mask=nd,
                                            **FOLD), np.float64)
    want = oracle.d8_accumulation(fd, weights=np.where(nd, 0.0, w))
    want[nd] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_mfd_folded_matches_oracle():
    """The FOLDED multi-flow GS kernel (production path for D∞/Quinn/…
    accumulation at ≥2048) against the oracle's topological queue."""
    from richdem_tpu.ops.pallas_mfd import mfd_accumulation_gs
    dem = synth.perlin_dem(72, 96, seed=7, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    props = oracle.flow_proportions(filled, method="Quinn")
    got = np.asarray(mfd_accumulation_gs(np.asarray(props, np.float32),
                                         engine="folded", **FOLD),
                     np.float64)
    want = oracle.flow_accumulation_from_props(props)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    # mass conservation: total outflow over the edge equals cell count
    assert abs(got.sum() - want.sum()) / want.sum() < 1e-6


def test_dinf_two_tap_folded_matches_oracle():
    """The D∞-specialized two-tap folded kernel (production path for
    FlowAccumulation('Dinf') at ≥2048) vs the oracle topological queue
    over the SAME proportions."""
    import jax.numpy as jnp
    from richdem_tpu.ops.flowdirs import dinf_flowdirs
    from richdem_tpu.ops.pallas_dinf import (dinf_accumulation_gs,
                                             dinf_two_tap, pack_two_tap,
                                             two_tap_props,
                                             unpack_two_tap)
    dem = synth.perlin_dem(72, 96, seed=10, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    ang = dinf_flowdirs(np.asarray(filled, np.float32))
    code, p = dinf_two_tap(ang)
    # the encoding decodes to the generic path's proportions (p carried
    # on the exact 2^-17 packing grid)
    from richdem_tpu.ops.flowdirs import proportions_from_dinf
    cq, pq = unpack_two_tap(pack_two_tap(code, p))
    np.testing.assert_array_equal(np.asarray(cq) * (np.asarray(pq) > 0),
                                  np.asarray(code) * (np.asarray(p) > 0))
    np.testing.assert_allclose(np.asarray(two_tap_props(cq, pq)),
                               np.asarray(proportions_from_dinf(ang)),
                               rtol=0, atol=1.0 / 131072)
    got = np.asarray(dinf_accumulation_gs(code, p, **FOLD), np.float64)
    # oracle over the QUANTIZED proportions the kernel actually uses
    want = oracle.flow_accumulation_from_props(
        np.asarray(two_tap_props(cq, pq), np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    assert abs(got.sum() - want.sum()) / want.sum() < 1e-6


def test_successor_resolve_folded_small():
    import jax.numpy as jnp
    from richdem_tpu.ops.pallas_folded import successor_resolve_folded
    dem = synth.perlin_dem(64, 80, seed=8, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    fd = oracle.d8_flowdirs(filled)
    h, w = fd.shape
    # watershed labeling (as methods.watersheds_from_flowdirs sets it up):
    # off-grid-pointing cells become terminals, init = own flat index at
    # terminals, -1 elsewhere
    from tests.reference_impls import successor_table
    succ = successor_table(fd)
    idx = np.arange(h * w, dtype=np.int32)
    fd_eff = np.where(succ == idx, 0, fd.reshape(-1)).reshape(h, w)
    pinned = (fd_eff == 0).astype(np.int32)
    init = np.where(pinned > 0, idx.reshape(h, w), -1).astype(np.int32)
    got = successor_resolve_folded(jnp.asarray(fd_eff), jnp.asarray(init),
                                   jnp.asarray(pinned), fold_pad=64)
    np.testing.assert_array_equal(np.asarray(got), terminal_labels(fd))


def test_strahler_folded_small():
    import jax.numpy as jnp
    from richdem_tpu.ops.pallas_folded import strahler_folded
    dem = synth.perlin_dem(64, 80, seed=9, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    fd = oracle.d8_flowdirs(filled)
    got = np.asarray(strahler_folded(jnp.asarray(fd), fold_pad=64))
    np.testing.assert_array_equal(got, strahler_numpy(fd))


def test_accum_folded_irrational_weights():
    """Arbitrary float weights: partial sums are NOT exactly
    representable, so this pins (a) rotation-level equality convergence
    (sound by DAG induction: once a cell's upstream values are
    bit-stable, its recomputed sum is bit-stable) and (b) agreement with
    the oracle queue — the case where per-sweep change flags would
    chatter forever (see pallas_folded._accum_folded_impl)."""
    from richdem_tpu.ops.pallas_folded import d8_accumulation_folded
    dem = synth.perlin_dem(64, 72, seed=14, dtype=np.float64)
    filled = oracle.priority_flood_epsilon(dem, eps=1e-3)
    fd = oracle.d8_flowdirs(filled)
    rng = np.random.default_rng(7)
    w = rng.uniform(0.1, 3.0, size=fd.shape)
    got = np.asarray(d8_accumulation_folded(
        fd, weights=np.asarray(w, np.float32), **FOLD), np.float64)
    want = oracle.d8_accumulation(fd, weights=w)
    np.testing.assert_allclose(got, want, rtol=2e-5)
