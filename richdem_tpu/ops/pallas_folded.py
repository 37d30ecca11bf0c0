"""Folded-row Pallas sweeps: full-VPU fill and D8 accumulation.

The strip-sequential kernels in :mod:`richdem_tpu.ops.pallas_sweeps`
process one ``(1, W)`` row per loop step.  On TPU that row occupies
``W/128`` vregs at 1/8 sublane utilization, so the sweeps are
vector-issue-bound (~0.7–1 µs per 8192-wide row — measured).  Here each
raster is **folded**: ``(H, W) → (H·f, W/f)`` row-major, so one original
row becomes an ``(f, L)`` group filling whole vregs (f=8 ⇒ 8× fewer
vector ops per row).  The price is a seam at each chunk boundary, fixed
by one sublane roll + two selects per lane shift.

Also removes per-sweep flip copies: the "up" sweep re-walks strips and
rows in reverse grid order (static ``reverse`` flag) instead of flipping
rasters, and the accumulation kernel reads the adjacent strip's rows via
``index_map`` (no materialized ±1-row rolled copies).

Same fixpoints, same oracle gates (tests/test_pallas_folded.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu.ops.sweeps import BIG
from richdem_tpu.ops.pallas_sweeps import (_PERM_TRANSPOSE, _pad_to,
                                           _strip_height)

__all__ = ["fill_fixpoint_folded", "d8_accumulation_folded"]

#: below this edge length the unfolded kernels (256-pad) win — folding
#: pads both dims to 1024 multiples.  Overridable per call (``fold_min=``)
#: so tests can exercise the folded path in interpret mode at small sizes.
_FOLD_MIN = 2048


#: Fold factor is always 8: Mosaic vector loads of an (f, L) group at a
#: dynamic sublane offset must be provably 8-aligned, so both grid dims
#: are padded to multiples of 8·128 = 1024 and groups start at r·8.
_F = 8
_FOLD_PAD = _F * 128

#: Edge length at which the multigrid warm start pays for itself
#: (one coarse rotation set ≈ 1/64 the cost of a fine rotation).
#: Overridable per call (``multiscale_min=``) for interpret-mode tests.
_MULTISCALE_MIN = 4096


#: test hook: when set (int), caps the folded strip height so interpret-
#: mode tests get multiple strips (and thus exercise the seam/carry and
#: index-mapped adjacent-strip logic) on small grids.  Read at trace time;
#: tests that set it use unique shapes/static args and clear jit caches.
_STRIP_CAP = None


def _fold_strip_height(h: int, width: int, n_bufs: int) -> int:
    """Strip height for a folded sweep: the VMEM-budget power of two,
    clamped/halved so it divides the padded row count ``h`` (small padded
    grids in interpret-mode tests have h below the 256-row budget cap)."""
    bh = _strip_height(width, n_bufs)
    if _STRIP_CAP is not None:
        bh = min(bh, _STRIP_CAP)
    bh = min(bh, h)
    while h % bh:
        bh //= 2
    return bh


def _require_converged(done, what, cap):
    """Raise on a concrete unconverged fixpoint — silently returning a
    truncated accumulation is a correctness bug (caught by the 2048² MFD
    native gate: Quinn at that size needs ~101 GS rotations).  Inside jit
    the flag is a tracer and the cap must be sized by the caller; the
    production caps are validated by tests/test_tpu_only.py."""
    if isinstance(done, jax.core.Tracer):
        return
    if not bool(done):
        raise RuntimeError(
            f"{what} did not converge within {cap} GS rotations; "
            "pass a larger max_rotations")


def _fold(x, f):
    """(H, W) → (H·f, W/f): original row r = folded rows [r·f, (r+1)·f)."""
    h, w = x.shape
    return x.reshape(h * f, w // f)


def _unfold(x, f):
    hf, L = x.shape
    return x.reshape(hf // f, L * f)


def _iotas(shape):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return lane, sub


def _gshift_east(x, fill, f):
    """West-neighbor values of a folded row-group (f, L)."""
    L = x.shape[-1]
    rolled = pltpu.roll(x, 1, axis=1)
    lane, sub = _iotas(x.shape)
    if f == 1:
        return jnp.where(lane == 0, fill, rolled)
    prev_last = pltpu.roll(x[:, L - 1:L], 1, axis=0)  # row s ← x[s-1, L-1]
    out = jnp.where(lane == 0, prev_last, rolled)
    return jnp.where((lane == 0) & (sub == 0), fill, out)


def _gshift_west(x, fill, f):
    """East-neighbor values of a folded row-group (f, L)."""
    L = x.shape[-1]
    rolled = pltpu.roll(x, L - 1, axis=1)
    lane, sub = _iotas(x.shape)
    if f == 1:
        return jnp.where(lane == L - 1, fill, rolled)
    next_first = pltpu.roll(x[:, 0:1], f - 1, axis=0)  # row s ← x[s+1, 0]
    out = jnp.where(lane == L - 1, next_first, rolled)
    return jnp.where((lane == L - 1) & (sub == f - 1), fill, out)


# ---------------------------------------------------------------------------
# Fill
# ---------------------------------------------------------------------------

def _fill_kernel(eps_ref, w_ref, floor_ref, out_ref, flag_ref, carry, *,
                 bh, f, reverse):
    """One directional sweep; also emits a single change flag (the
    in-kernel convergence detector — replaces an 8 B/cell whole-raster
    equality reduce per rotation)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # off-grid row beyond the first processed strip: a drain
        carry[...] = jnp.full(carry.shape, -BIG, carry.dtype)
        flag_ref[...] = jnp.zeros(flag_ref.shape, jnp.int32)

    neg = jnp.float32(-BIG)
    eps = eps_ref[0]
    eps_diag = eps_ref[1]

    def row_body(k, state):
        prev, diff = state
        r = (bh - 1 - k) if reverse else k
        sl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        wr = w_ref[sl]
        fr = floor_ref[sl]
        cand = prev + eps
        cand = jnp.minimum(cand, _gshift_east(prev, neg, f) + eps_diag)
        cand = jnp.minimum(cand, _gshift_west(prev, neg, f) + eps_diag)
        new = jnp.minimum(wr, jnp.maximum(fr, cand))
        out_ref[sl] = new
        # change detection stays VECTOR-shaped in the loop (a per-row
        # scalar reduce serializes the VPU — measured 10% regression);
        # int32 carry (Mosaic cannot legalize bool loop carries);
        # one reduce per strip after the loop
        return new, diff | (new != wr).astype(jnp.int32)

    fin, diff = jax.lax.fori_loop(
        0, bh, row_body,
        (carry[...], jnp.zeros(carry.shape, jnp.int32)))
    carry[...] = fin
    chg = jnp.any(diff != 0)

    @pl.when(chg)
    def _():
        # vreg-shaped store: Mosaic cannot store scalars to VMEM
        flag_ref[...] = jnp.ones(flag_ref.shape, jnp.int32)


def _fill_sweep(w, floor, eps2, f, reverse):
    hf, L = w.shape
    h = hf // f
    bh = _fold_strip_height(h, L * f, n_bufs=3)
    n = h // bh
    if reverse:
        def imap(i, eps):
            return (n - 1 - i, 0)
    else:
        def imap(i, eps):
            return (i, 0)
    blk = pl.BlockSpec((bh * f, L), imap, memory_space=pltpu.VMEM)
    flag_blk = pl.BlockSpec((8, 128), lambda i, eps: (0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[blk, blk],
        out_specs=[blk, flag_blk],
        scratch_shapes=[pltpu.VMEM((f, L), jnp.float32)],
    )
    out, flag = pl.pallas_call(
        functools.partial(_fill_kernel, bh=bh, f=f, reverse=reverse),
        out_shape=[jax.ShapeDtypeStruct((hf, L), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        grid_spec=grid_spec,
    )(eps2, w, floor)
    return out, flag[0, 0]


def _refold_T(x_folded, f_from, f_to):
    """Convert vertical-folded state to transposed-folded (one permute)."""
    return _fold(_unfold(x_folded, f_from).T, f_to)


def _coarse_warm_start(zed, eps, factor=8, max_iters=256, fold_min=None,
                       fold_pad=None):
    """Multigrid upper bound: plain-fill the block-max-pooled DEM and
    upsample.  Any coarse drainage path expands to a fine path with
    smaller maxima (blocks are internally connected and block-max ≥ every
    member), so the upsampled coarse fill ≥ the fine fixpoint — a valid
    ``w0`` for the monotone-decreasing sweeps.  For ε-fill a coarse step
    covers ≤ 2·factor² fine steps, hence the ε scaling.  Nodata cells
    must already carry -BIG in ``zed`` (partially-nodata blocks then pool
    to a data value = coarse has fewer drains = still an upper bound)."""
    h, w = zed.shape
    ph, pw = (-h) % factor, (-w) % factor
    zp = jnp.pad(zed, ((0, ph), (0, pw)), constant_values=-BIG)
    zc = jax.lax.reduce_window(zp, -jnp.inf, jax.lax.max,
                               (factor, factor), (factor, factor), "VALID")
    wc, _, _ = fill_fixpoint_folded(zc, eps=eps * (2.0 * factor * factor),
                                    max_iters=max_iters, multiscale=False,
                                    fold_min=fold_min, fold_pad=fold_pad)
    up = jnp.repeat(jnp.repeat(wc, factor, axis=0), factor, axis=1)
    return jnp.maximum(up[:h, :w], zed)


@functools.partial(jax.jit, static_argnames=("max_iters", "check_every",
                                             "fold_pad"))
def _fill_folded_impl(z32, nodata_mask, w0, eps2, *, max_iters,
                      check_every, fold_pad):
    h, wd = z32.shape
    neg = jnp.float32(-BIG)
    floor = jnp.where(nodata_mask, neg, z32)
    w0 = jnp.where(nodata_mask, neg, w0)

    floor_p = _pad_to(floor, -BIG, mh=fold_pad, mw=fold_pad)
    w_p = _pad_to(w0, -BIG, mh=fold_pad, mw=fold_pad)
    f_v = f_t = _F
    floor_v = _fold(floor_p, f_v)
    floor_t = _fold(floor_p.T, f_t)
    wv = _fold(w_p, f_v)

    def rotation(wv):
        wv, c1 = _fill_sweep(wv, floor_v, eps2, f_v, reverse=False)
        wv, c2 = _fill_sweep(wv, floor_v, eps2, f_v, reverse=True)
        wt = _refold_T(wv, f_v, f_t)
        wt, c3 = _fill_sweep(wt, floor_t, eps2, f_t, reverse=False)
        wt, c4 = _fill_sweep(wt, floor_t, eps2, f_t, reverse=True)
        return _fold(_unfold(wt, f_t).T, f_v), c1 + c2 + c3 + c4

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_iters)

    def body(state):
        w, it, _ = state
        new = w
        changed = jnp.int32(0)
        for _ in range(check_every):
            new, c = rotation(new)
            changed = changed + c
        # in-kernel flags: a rotation in which no sweep wrote a new
        # value IS the fixpoint (each sweep is idempotent there)
        return new, it + check_every, changed == 0

    done0 = jnp.any(wv != wv)
    wv, iters, done = jax.lax.while_loop(cond, body,
                                         (wv, jnp.int32(0), done0))
    filled = _unfold(wv, f_v)[:h, :wd]
    return jnp.where(nodata_mask, z32, filled), iters, done


def fill_fixpoint_folded(z, nodata_mask=None, eps=0.0, eps_diag=None,
                         max_iters=256, check_every=1, w0=None,
                         multiscale=True, fold_min=None, fold_pad=None,
                         multiscale_min=None):
    """Drop-in for ``pallas_sweeps.fill_fixpoint_pallas`` (same fixpoint,
    same (filled, iters, converged) contract), ~3× faster sweeps; large
    grids start from a multigrid upper bound (one coarse rotation set at
    1/64 the cost replaces 1+ fine rotations and bounds the iteration
    count by the coarse topology, not the fine one).

    ``fold_min``/``fold_pad``/``multiscale_min`` override the production
    dispatch thresholds (module defaults) so tests can run the folded
    kernels and the multigrid path in interpret mode at small sizes."""
    z32 = jnp.asarray(z, jnp.float32)
    h, wd = z32.shape
    fmin = _FOLD_MIN if fold_min is None else fold_min
    fpad = _FOLD_PAD if fold_pad is None else fold_pad
    msmin = _MULTISCALE_MIN if multiscale_min is None else multiscale_min
    if max(h, wd) < fmin:
        from richdem_tpu.ops import pallas_sweeps
        return pallas_sweeps.fill_fixpoint_pallas(
            z, nodata_mask, eps=eps, eps_diag=eps_diag,
            max_iters=max_iters, check_every=check_every, w0=w0)
    if nodata_mask is None:
        nodata_mask = jnp.zeros(z32.shape, bool)
    else:
        nodata_mask = jnp.asarray(nodata_mask)
    eps = jnp.asarray(eps, jnp.float32)
    if (w0 is None and multiscale and eps_diag is None
            and max(h, wd) >= msmin):
        zed = jnp.where(nodata_mask, jnp.float32(-BIG), z32)
        w0 = _coarse_warm_start(zed, eps, fold_min=fmin, fold_pad=fpad)
    if w0 is None:
        w0 = jnp.full(z32.shape, jnp.float32(BIG))
    else:
        w0 = jnp.asarray(w0, jnp.float32)
    eps_d = eps if eps_diag is None else jnp.asarray(eps_diag, jnp.float32)
    eps2 = jnp.stack([eps, eps_d])
    return _fill_folded_impl(z32, nodata_mask, w0, eps2,
                             max_iters=max_iters, check_every=check_every,
                             fold_pad=fpad)


# ---------------------------------------------------------------------------
# D8 accumulation
# ---------------------------------------------------------------------------

def _accum_kernel(w_ref, fd_ref, fdx_ref, acc_ref, accx_ref, out_ref,
                  flag_ref, c_acc, c_fd, *, bh, f, reverse):
    """GS sweep of ``A = w + Pᵀ A``; folded groups, strip carry.

    forward: NEW side = processed row above (source codes S=7 straight,
    SE=6 from the west source, SW=8 from the east source); OLD side = row
    below, sweep-start values (codes N=3, NE=4 west, NW=2 east).
    reverse swaps the code trios and walks everything bottom-up.
    fdx/accx are (f, L) blocks holding JUST the adjacent strip's boundary
    group (index-mapped — loading the whole neighbor strip would double
    the sweep's HBM traffic for one row of it); carry holds the last
    processed group's new accumulation and codes."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        c_acc[...] = jnp.zeros(c_acc.shape, c_acc.dtype)
        c_fd[...] = jnp.zeros(c_fd.shape, c_fd.dtype)
        flag_ref[...] = jnp.zeros(flag_ref.shape, jnp.int32)

    zero = jnp.float32(0.0)
    new_codes = (3, 4, 2) if reverse else (7, 6, 8)
    old_codes = (7, 6, 8) if reverse else (3, 4, 2)

    def row_body(k, carry_in):
        prev_a, prev_fd, chg0 = carry_in
        r = (bh - 1 - k) if reverse else k
        sl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        a_l = acc_ref[sl]
        w_l = w_ref[sl]
        fd_l = fd_ref[sl]

        cs, cw, ce = new_codes
        newc = (prev_a * (prev_fd == cs)
                + _gshift_east(prev_a * (prev_fd == cw), zero, f)
                + _gshift_west(prev_a * (prev_fd == ce), zero, f))

        # old-side row: within the strip, else the adjacent strip's
        # boundary group; zero past the spatial edge.
        ro = r - 1 if reverse else r + 1
        in_strip = (ro >= 0) & (ro < bh)
        rs = jnp.clip(ro, 0, bh - 1)
        at_edge = i == n - 1
        rsf = pl.multiple_of(rs * f, f)
        a_o = jnp.where(in_strip, acc_ref[pl.ds(rsf, f), :],
                        accx_ref[...])
        fd_o = jnp.where(in_strip, fd_ref[pl.ds(rsf, f), :],
                         fdx_ref[...])
        a_o = a_o * jnp.logical_or(in_strip, jnp.logical_not(at_edge))

        os_, ow, oe = old_codes
        oldb = (a_o * (fd_o == os_)
                + _gshift_east(a_o * (fd_o == ow), zero, f)
                + _gshift_west(a_o * (fd_o == oe), zero, f))
        oldl = (_gshift_east(a_l * (fd_l == 5), zero, f)
                + _gshift_west(a_l * (fd_l == 1), zero, f))
        new = w_l + newc + oldb + oldl
        out_ref[sl] = new
        return (new, fd_l, chg0 | (new != a_l).astype(jnp.int32))

    acc_fin, fd_fin, diff = jax.lax.fori_loop(
        0, bh, row_body,
        (c_acc[...], c_fd[...], jnp.zeros(c_acc.shape, jnp.int32)))
    c_acc[...] = acc_fin
    c_fd[...] = fd_fin
    chg = jnp.any(diff != 0)

    @pl.when(chg)
    def _():
        # vreg-shaped store: Mosaic cannot store scalars to VMEM
        flag_ref[...] = jnp.ones(flag_ref.shape, jnp.int32)


def _strip_maps(n, bh, reverse):
    """Index maps: ``smap`` = processed strip; ``xgroup`` = the adjacent
    (next-unprocessed) strip's boundary ROW GROUP, in (f, L)-block units
    — only f rows of the neighbor strip ever get read, so only f rows
    ride the DMA."""
    if reverse:
        def smap(i):
            return n - 1 - i

        def xgroup(i):
            # previous strip's LAST group
            return jnp.maximum(n - 2 - i, 0) * bh + (bh - 1)
    else:
        def smap(i):
            return i

        def xgroup(i):
            # next strip's FIRST group
            return jnp.minimum(i + 1, n - 1) * bh
    return smap, xgroup


def _accum_sweep(acc, w, fd, f, reverse):
    hf, L = acc.shape
    h = hf // f
    bh = _fold_strip_height(h, L * f, n_bufs=5)
    n = h // bh
    smap, xgroup = _strip_maps(n, bh, reverse)

    def blk(m):
        return pl.BlockSpec((bh * f, L), lambda i, _m=m: (_m(i), 0),
                            memory_space=pltpu.VMEM)

    def xblk():
        return pl.BlockSpec((f, L), lambda i: (xgroup(i), 0),
                            memory_space=pltpu.VMEM)

    flag_blk = pl.BlockSpec((8, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out, flag = pl.pallas_call(
        functools.partial(_accum_kernel, bh=bh, f=f, reverse=reverse),
        out_shape=[jax.ShapeDtypeStruct((hf, L), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        grid=(n,),
        in_specs=[blk(smap), blk(smap), xblk(), blk(smap), xblk()],
        out_specs=[blk(smap), flag_blk],
        scratch_shapes=[pltpu.VMEM((f, L), jnp.float32),
                        pltpu.VMEM((f, L), jnp.int32)],
    )(w, fd, fd, acc, acc)
    return out, flag[0, 0]


def _remap_codes(fd, perm):
    table = jnp.asarray(np.asarray(perm, np.int32))
    return table[fd.clip(0)]


@functools.partial(jax.jit, static_argnames=("max_rotations", "fold_pad"))
def _accum_folded_impl(fd, weights, max_rotations, fold_pad=_FOLD_PAD):
    h, wd = fd.shape
    fd_p = _pad_to(jnp.asarray(fd, jnp.int32).clip(0), 0,
                   mh=fold_pad, mw=fold_pad)
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0,
                  mh=fold_pad, mw=fold_pad)
    hp, wp = fd_p.shape
    f_v = f_t = _F
    fd_v = _fold(fd_p, f_v)
    fd_t = _fold(_remap_codes(fd_p, _PERM_TRANSPOSE).T, f_t)
    w_v = _fold(w_p, f_v)
    w_t = _fold(w_p.T, f_t)

    # NOTE: unlike the fill (a clamped SELECTION fixpoint, where every
    # sweep is idempotent at the fixpoint), accumulation sweeps re-SUM
    # their taps with orientation-dependent grouping, so per-sweep
    # change flags chatter in the last float bit for non-integer weights
    # (measured: D-infinity never settles).  Convergence therefore stays
    # a rotation-level equality; the kernels' flag outputs are ignored.
    def rotation(acc):
        acc, _ = _accum_sweep(acc, w_v, fd_v, f_v, reverse=False)
        acc, _ = _accum_sweep(acc, w_v, fd_v, f_v, reverse=True)
        at = _refold_T(acc, f_v, f_t)
        at, _ = _accum_sweep(at, w_t, fd_t, f_t, reverse=False)
        at, _ = _accum_sweep(at, w_t, fd_t, f_t, reverse=True)
        return _fold(_unfold(at, f_t).T, f_v)

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_rotations)

    def body(state):
        acc, it, _ = state
        new = rotation(acc)
        return new, it + 1, jnp.all(new == acc)

    done0 = jnp.any(w_v != w_v)
    acc, iters, done = jax.lax.while_loop(cond, body,
                                          (w_v, jnp.int32(0), done0))
    return _unfold(acc, f_v)[:h, :wd], iters, done


def d8_accumulation_folded(flowdirs, weights=None, no_data_mask=None,
                           max_rotations=64, fold_min=None, fold_pad=None,
                           return_info=False):
    """Drop-in for ``pallas_sweeps.d8_accumulation_gs`` (exact D8
    accumulation), folded-row kernels.  ``fold_min``/``fold_pad`` override
    the dispatch thresholds for interpret-mode tests; ``return_info``
    additionally returns ``(rotations, converged)`` (roofline accounting)."""
    fd = jnp.asarray(flowdirs)
    h, wd = fd.shape
    fmin = _FOLD_MIN if fold_min is None else fold_min
    fpad = _FOLD_PAD if fold_pad is None else fold_pad
    if max(h, wd) < fmin:
        from richdem_tpu.ops import pallas_sweeps
        return pallas_sweeps.d8_accumulation_gs(
            flowdirs, weights=weights, no_data_mask=no_data_mask,
            max_rotations=max_rotations, return_info=return_info)
    if weights is None:
        weights = jnp.ones((h, wd), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    if no_data_mask is not None:
        weights = jnp.where(jnp.asarray(no_data_mask), 0.0, weights)
    acc, iters, done = _accum_folded_impl(fd, weights, max_rotations,
                                          fold_pad=fpad)
    _require_converged(done, "folded D8 accumulation", max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc


def _fill_engine():
    """Production fill engine: ``RICHDEM_TPU_FILL_ENGINE`` = ``scan``
    (2 clamp-scan sweeps/rotation, ops/pallas_scan.py) or ``folded``
    (4 sweeps + 2 transposes).  Read per call so tests and benches can
    flip it without re-importing."""
    import os
    return os.environ.get("RICHDEM_TPU_FILL_ENGINE", _FILL_DEFAULT)


#: flipped to "scan" once the scan fill's hardware gates + timings land
#: (tests/test_tpu_only.py; tools/probe_flats.py)
_FILL_DEFAULT = "folded"


def fill_fixpoint_pallas(*args, **kw):
    """Engine-dispatching fill (see :func:`_fill_engine`); call sites
    switch between engines by env var only."""
    if _fill_engine() == "scan":
        from richdem_tpu.ops.pallas_scan import fill_fixpoint_scan
        return fill_fixpoint_scan(*args, **kw)
    return fill_fixpoint_folded(*args, **kw)


def _accum_engine(auto=None):
    """Production accumulation engine: ``RICHDEM_TPU_ACCUM_ENGINE`` =
    ``scan`` (scan-GS sweeps, ops/pallas_scan.py), ``folded`` (4 sweeps
    + 2 transposes) or ``auto`` (the default: each dispatcher picks the
    engine its convergence profile favors — see the dispatch sites).
    Read per call so tests and benches can flip it without
    re-importing."""
    import os
    eng = os.environ.get("RICHDEM_TPU_ACCUM_ENGINE", _ACCUM_DEFAULT)
    if eng == "auto" and auto is not None:
        return auto
    return eng


#: ``auto`` resolves per metric: D8 keeps the folded kernels (its GS
#: fixpoint needs only 4-9 rotations and the folded sweep is ~1.7x
#: cheaper than a scan sweep); divergent multi-flow metrics take the
#: 4-sweep scan rotation (flat ~O(1) rotation count vs O(diameter) —
#: Quinn at 2048^2: ~74 folded rotations; hardware gate
#: tests/test_tpu_only.py asserts the >=3x reduction).  D-infinity
#: joined the scan side in r4: on the eps=1e-2 bench surface at 4096^2
#: the depth-16 scan converges in 6 rotations vs 14 folded (84.6 vs
#: 88.1 ms, and the gap widens with grid size since the scan rotation
#: count is flat — tools/hw_r4_logs/probe_dinf_engines.log).
_ACCUM_DEFAULT = "auto"


def d8_accumulation_gs(*args, **kw):
    """Engine-dispatching D8 accumulation (see :func:`_accum_engine`);
    ``auto`` keeps folded — D8's rotation count is already small (4-9)
    and the folded sweep is cheaper than a scan sweep."""
    if _accum_engine(auto="folded") == "scan":
        from richdem_tpu.ops.pallas_scan import d8_accumulation_scan
        return d8_accumulation_scan(*args, **kw)
    return d8_accumulation_folded(*args, **kw)


# ---------------------------------------------------------------------------
# Successor resolve: V(c) = V(successor(c)) until fixpoint
# ---------------------------------------------------------------------------
#
# Watershed labeling and upslope-cell marking both copy a value from each
# cell's D8 successor (the cell it flows to) until every cell carries its
# terminal's value — the reverse-direction analog of accumulation.  The
# same strip-GS structure applies: a down-sweep resolves every cell whose
# successor chain climbs monotonically upward, etc.  ``pinned`` cells
# (sinks, seeds) keep their init value.

def _resolve_kernel(v_ref, vx_ref, fd_ref, fdx_ref, pin_ref, out_ref,
                    carry, *, bh, f, reverse):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.full(carry.shape, -1, carry.dtype)

    def row_body(k, prev):
        r = (bh - 1 - k) if reverse else k
        sl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        v_l = v_ref[sl]
        fd_l = fd_ref[sl]
        pin = pin_ref[sl]

        # successor in the already-processed neighbor row (NEW values):
        # forward: codes {2=NW, 3=N, 4=NE}; reverse: {8=SW, 7=S, 6=SE}.
        cs, cw, ce = (7, 8, 6) if reverse else (3, 2, 4)
        fill = jnp.int32(-1)
        up = jnp.where(fd_l == cs, prev, v_l)
        up = jnp.where(fd_l == cw, _gshift_east(prev, fill, f), up)
        up = jnp.where(fd_l == ce, _gshift_west(prev, fill, f), up)

        # successor in the not-yet-processed row (sweep-start values)
        ro = r - 1 if reverse else r + 1
        in_strip = (ro >= 0) & (ro < bh)
        rs = pl.multiple_of(jnp.clip(ro, 0, bh - 1) * f, f)
        v_o = jnp.where(in_strip, v_ref[pl.ds(rs, f), :],
                        vx_ref[...])
        os_, ow, oe = (3, 2, 4) if reverse else (7, 8, 6)
        dn = jnp.where(fd_l == os_, v_o, up)
        dn = jnp.where(fd_l == ow, _gshift_east(v_o, fill, f), dn)
        dn = jnp.where(fd_l == oe, _gshift_west(v_o, fill, f), dn)

        # in-row successors (sweep-start values)
        new = jnp.where(fd_l == 1, _gshift_east(v_l, fill, f), dn)
        new = jnp.where(fd_l == 5, _gshift_west(v_l, fill, f), new)
        new = jnp.where(pin > 0, v_l, new)
        out_ref[sl] = new
        return new

    carry[...] = jax.lax.fori_loop(0, bh, row_body, carry[...])


def _resolve_sweep(v, fd, pin, f, reverse):
    hf, L = v.shape
    h = hf // f
    bh = _fold_strip_height(h, L * f, n_bufs=5)
    n = h // bh
    smap, xgroup = _strip_maps(n, bh, reverse)

    def blk(m):
        return pl.BlockSpec((bh * f, L), lambda i, _m=m: (_m(i), 0),
                            memory_space=pltpu.VMEM)

    def xblk():
        return pl.BlockSpec((f, L), lambda i: (xgroup(i), 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_resolve_kernel, bh=bh, f=f, reverse=reverse),
        out_shape=jax.ShapeDtypeStruct((hf, L), jnp.int32),
        grid=(n,),
        in_specs=[blk(smap), xblk(), blk(smap), xblk(), blk(smap)],
        out_specs=blk(smap),
        scratch_shapes=[pltpu.VMEM((f, L), jnp.int32)],
    )(v, v, fd, fd, pin)


@functools.partial(jax.jit, static_argnames=("max_rotations", "fold_pad"))
def successor_resolve_folded(flowdirs, init, pinned, max_rotations=64,
                             fold_pad=_FOLD_PAD):
    """Iterate ``V(c) ← V(successor(c))`` (pinned cells fixed) to the
    fixpoint; int32 values.  Used for watershed labels and upslope masks.
    """
    fd = jnp.asarray(flowdirs)
    h, wd = fd.shape
    fd_p = _pad_to(fd.astype(jnp.int32).clip(0), 0,
                   mh=fold_pad, mw=fold_pad)
    v_p = _pad_to(jnp.asarray(init, jnp.int32), -1,
                  mh=fold_pad, mw=fold_pad)
    pin_p = _pad_to(jnp.asarray(pinned, jnp.int32), 1,
                    mh=fold_pad, mw=fold_pad)
    f = _F
    fd_v = _fold(fd_p, f)
    fd_t = _fold(_remap_codes(fd_p, _PERM_TRANSPOSE).T, f)
    pin_v = _fold(pin_p, f)
    pin_t = _fold(pin_p.T, f)
    v = _fold(v_p, f)

    def rotation(v):
        v = _resolve_sweep(v, fd_v, pin_v, f, reverse=False)
        v = _resolve_sweep(v, fd_v, pin_v, f, reverse=True)
        vt = _refold_T(v, f, f)
        vt = _resolve_sweep(vt, fd_t, pin_t, f, reverse=False)
        vt = _resolve_sweep(vt, fd_t, pin_t, f, reverse=True)
        return _fold(_unfold(vt, f).T, f)

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_rotations)

    def body(state):
        v, it, _ = state
        new = rotation(v)
        return new, it + 1, jnp.all(new == v)

    done0 = jnp.any(fd_v != fd_v)
    v, _, _ = jax.lax.while_loop(cond, body, (v, jnp.int32(0), done0))
    return _unfold(v, f)[:h, :wd]


# ---------------------------------------------------------------------------
# Strahler stream order
# ---------------------------------------------------------------------------
#
# order(c) = 1 on leaves; m if exactly one inflowing neighbor attains the
# max inflow order m; m+1 if two or more do.  Orders only grow under the
# update, so GS sweeps converge from below to the exact DAG solution in a
# few rotations (the XLA stencil fixpoint needs one iteration per
# flow-path step).

def _strahler_kernel(ord_ref, ordx_ref, fd_ref, fdx_ref, out_ref,
                     c_ord, c_fd, *, bh, f, reverse):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        c_ord[...] = jnp.zeros(c_ord.shape, c_ord.dtype)
        c_fd[...] = jnp.zeros(c_fd.shape, c_fd.dtype)

    # inflow codes: the neighbor at direction d flows into us if its code
    # is D8_INVERSE[d].  Grouped by source row relative to the sweep.
    new_codes = (3, 4, 2) if reverse else (7, 6, 8)   # processed row
    old_codes = (7, 6, 8) if reverse else (3, 4, 2)   # unprocessed row

    def row_body(k, carry_in):
        prev_o, prev_fd = carry_in
        r = (bh - 1 - k) if reverse else k
        sl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        o_l = ord_ref[sl]
        fd_l = fd_ref[sl]

        ro = r - 1 if reverse else r + 1
        in_strip = (ro >= 0) & (ro < bh)
        rs = pl.multiple_of(jnp.clip(ro, 0, bh - 1) * f, f)
        at_edge = i == n - 1
        o_o = jnp.where(in_strip, ord_ref[pl.ds(rs, f), :],
                        ordx_ref[...])
        fd_o = jnp.where(in_strip, fd_ref[pl.ds(rs, f), :],
                         fdx_ref[...])
        o_o = o_o * jnp.logical_or(in_strip, jnp.logical_not(at_edge))

        zero = jnp.int32(0)
        cs, cw, ce = new_codes
        os_, ow, oe = old_codes
        taps = [
            jnp.where(prev_fd == cs, prev_o, zero),
            _gshift_east(jnp.where(prev_fd == cw, prev_o, zero), zero, f),
            _gshift_west(jnp.where(prev_fd == ce, prev_o, zero), zero, f),
            jnp.where(fd_o == os_, o_o, zero),
            _gshift_east(jnp.where(fd_o == ow, o_o, zero), zero, f),
            _gshift_west(jnp.where(fd_o == oe, o_o, zero), zero, f),
            _gshift_east(jnp.where(fd_l == 5, o_l, zero), zero, f),
            _gshift_west(jnp.where(fd_l == 1, o_l, zero), zero, f),
        ]
        m = taps[0]
        for t in taps[1:]:
            m = jnp.maximum(m, t)
        kcnt = jnp.zeros_like(m)
        for t in taps:
            kcnt = kcnt + ((t == m) & (m > 0)).astype(jnp.int32)
        upd = jnp.where(m == 0, jnp.int32(1),
                        jnp.where(kcnt >= 2, m + 1, m))
        new = jnp.maximum(o_l, upd) * (o_l > 0)  # 0 stays nodata
        out_ref[sl] = new
        return (new, fd_l)

    o_fin, fd_fin = jax.lax.fori_loop(0, bh, row_body,
                                      (c_ord[...], c_fd[...]))
    c_ord[...] = o_fin
    c_fd[...] = fd_fin


def _strahler_sweep(order, fd, f, reverse):
    hf, L = order.shape
    h = hf // f
    bh = _fold_strip_height(h, L * f, n_bufs=4)
    n = h // bh
    smap, xgroup = _strip_maps(n, bh, reverse)

    def blk(m):
        return pl.BlockSpec((bh * f, L), lambda i, _m=m: (_m(i), 0),
                            memory_space=pltpu.VMEM)

    def xblk():
        return pl.BlockSpec((f, L), lambda i: (xgroup(i), 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_strahler_kernel, bh=bh, f=f, reverse=reverse),
        out_shape=jax.ShapeDtypeStruct((hf, L), jnp.int32),
        grid=(n,),
        in_specs=[blk(smap), xblk(), blk(smap), xblk()],
        out_specs=blk(smap),
        scratch_shapes=[pltpu.VMEM((f, L), jnp.int32),
                        pltpu.VMEM((f, L), jnp.int32)],
    )(order, order, fd, fd)


@functools.partial(jax.jit, static_argnames=("max_rotations", "fold_pad"))
def strahler_folded(flowdirs, max_rotations=64, fold_pad=_FOLD_PAD):
    """Strahler order via folded GS sweeps; 0 on nodata cells."""
    fd = jnp.asarray(flowdirs)
    h, wd = fd.shape
    data = (fd >= 0).astype(jnp.int32)
    fd_p = _pad_to(fd.astype(jnp.int32).clip(0), 0,
                   mh=fold_pad, mw=fold_pad)
    o_p = _pad_to(data, 0, mh=fold_pad, mw=fold_pad)
    f = _F
    fd_v = _fold(fd_p, f)
    fd_t = _fold(_remap_codes(fd_p, _PERM_TRANSPOSE).T, f)
    o = _fold(o_p, f)

    def rotation(o):
        o = _strahler_sweep(o, fd_v, f, reverse=False)
        o = _strahler_sweep(o, fd_v, f, reverse=True)
        ot = _refold_T(o, f, f)
        ot = _strahler_sweep(ot, fd_t, f, reverse=False)
        ot = _strahler_sweep(ot, fd_t, f, reverse=True)
        return _fold(_unfold(ot, f).T, f)

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_rotations)

    def body(state):
        o, it, _ = state
        new = rotation(o)
        return new, it + 1, jnp.all(new == o)

    done0 = jnp.any(o != o)
    o, _, _ = jax.lax.while_loop(cond, body, (o, jnp.int32(0), done0))
    return _unfold(o, f)[:h, :wd]
