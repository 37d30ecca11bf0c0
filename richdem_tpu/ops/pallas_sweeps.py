"""Pallas TPU kernels for the hot fixpoint sweeps (fill + D8 accumulation).

Why Pallas here and not plain XLA (which runs the same math in
:mod:`richdem_tpu.ops.sweeps` / :mod:`richdem_tpu.ops.accum`):

1. **Compile time.**  The lane-axis ``associative_scan`` graphs in the XLA
   sweep engine hit a size-dependent XLA-TPU compile blowup (minutes at
   2048², unusable at 8192² — the axon compile helper runs XLA on the
   host CPU).  Mosaic kernels compile in <1 s regardless of grid size.
2. **Run time.**  A strip-sequential Gauss–Seidel sweep resolves an
   arbitrarily long monotone path in ONE pass (the XLA Jacobi+scan engine
   needs one iteration per direction change *and* pays ~log n scan passes
   per sweep), and the ``lax.scan``-over-rows GS accumulation pays per-row
   dispatch overhead that a ``fori_loop`` over VMEM rows does not.

Design (SURVEY.md §7 step 4, appendix A.2/A.6): the grid is processed in
horizontal strips of ``bh`` rows; the TPU grid iterates strips IN ORDER, a
``(1, W)`` VMEM scratch row carries the previous strip's last NEW row, and
rows within a strip are relaxed sequentially from the row above.  Four
directional sweeps (down, up, and the two transposes) cover all 8 neighbor
directions — down relaxes {NW, N, NE}, up {SE, S, SW}, transposed-down the
W-side trio, transposed-up the E-side trio — so one rotation propagates
information along any monotone path, and the fixpoint converges in a few
rotations on real terrain.

Correctness contract: identical fixpoint as the oracle's Priority-Flood
(appendix A.2 — the filled surface is the unique least fixpoint of
``W = max(Z, min_d(W_d + eps))`` with drain boundaries) and as the oracle's
topological-queue accumulation, gated by tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu.ops.sweeps import BIG

__all__ = ["fill_fixpoint_pallas", "minplus_rotation", "d8_accumulation_gs",
           "accum_rotation"]

#: Both grid dims are padded to multiples of this (power of two ≥ 128), so
#: every strip height below divides the padded extent of either axis.
_PAD = 256


def _strip_height(width: int, n_bufs: int, budget=12 << 20) -> int:
    """Largest power-of-two strip height (≤ _PAD) such that ``n_bufs``
    double-buffered (bh, width) f32 blocks fit the ~16 MB VMEM scope."""
    per_row = max(width, 128) * 4 * n_bufs * 2
    bh = 8
    while bh * 2 <= _PAD and (bh * 2) * per_row <= budget:
        bh *= 2
    return bh


def _shift_east(row, fill):
    """Value of the west neighbor at each lane (shift right by one)."""
    out = pltpu.roll(row, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane == 0, fill, out)


def _shift_west(row, fill):
    """Value of the east neighbor at each lane (shift left by one)."""
    out = pltpu.roll(row, row.shape[-1] - 1, axis=1)  # -1 mod W
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane == row.shape[-1] - 1, fill, out)


def _pad_to(x, value, mh=_PAD, mw=_PAD):
    h, w = x.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, ph), (0, pw)), constant_values=value)


# ---------------------------------------------------------------------------
# Fill / min-plus sweep
# ---------------------------------------------------------------------------

def _fill_down_kernel(eps_ref, w_ref, floor_ref, out_ref, carry, *, bh):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # Off-grid row above the grid: a drain (Priority-Flood seeds the
        # border; -BIG guarantees border rows relax to their floor).
        carry[...] = jnp.full(carry.shape, -BIG, carry.dtype)

    neg = jnp.float32(-BIG)
    eps = eps_ref[0]
    eps_diag = eps_ref[1]

    def row_body(r, prev):
        wr = w_ref[pl.ds(r, 1), :]
        fr = floor_ref[pl.ds(r, 1), :]
        cand = prev + eps                                       # from N
        cand = jnp.minimum(cand, _shift_east(prev, neg) + eps_diag)  # NW
        cand = jnp.minimum(cand, _shift_west(prev, neg) + eps_diag)  # NE
        new = jnp.minimum(wr, jnp.maximum(fr, cand))
        out_ref[pl.ds(r, 1), :] = new
        return new

    carry[...] = jax.lax.fori_loop(0, bh, row_body, carry[...])


def _fill_sweep_down(w, floor, eps2):
    h, wd = w.shape
    bh = _strip_height(wd, n_bufs=3)
    assert h % bh == 0, (h, bh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h // bh,),
        in_specs=[
            pl.BlockSpec((bh, wd), lambda i, eps: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, wd), lambda i, eps: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, wd), lambda i, eps: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, wd), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fill_down_kernel, bh=bh),
        out_shape=jax.ShapeDtypeStruct((h, wd), jnp.float32),
        grid_spec=grid_spec,
    )(eps2, w, floor)


def minplus_rotation(w, floor, eps2):
    """One full down/up/right/left Gauss–Seidel rotation (all 8 dirs).

    ``eps2``: (2,) f32 — [straight eps, diagonal eps]."""
    w = _fill_sweep_down(w, floor, eps2)
    w = jnp.flipud(_fill_sweep_down(jnp.flipud(w), jnp.flipud(floor), eps2))
    wt, ft = w.T, floor.T
    wt = _fill_sweep_down(wt, ft, eps2)
    wt = jnp.flipud(_fill_sweep_down(jnp.flipud(wt), jnp.flipud(ft), eps2))
    return wt.T


@functools.partial(jax.jit, static_argnames=("max_iters", "check_every"))
def fill_fixpoint_pallas(z, nodata_mask=None, eps=0.0, eps_diag=None,
                         max_iters=256, check_every=1, w0=None):
    """Depression fill via Pallas GS rotations; returns
    ``(filled, iters, converged)``.  Same fixpoint (and output) as
    :func:`richdem_tpu.ops.fill.fill_depressions_info`.

    ``w0``: optional warm-start / Dirichlet state.  Cells where
    ``w0 == floor`` stay clamped (the sweep is monotone decreasing and
    bounded below by the floor) — the block-Schwarz sharded fill uses
    this to pin its halo ring to the incoming neighbor values."""
    z32 = jnp.asarray(z, jnp.float32)
    h, wd = z32.shape
    if nodata_mask is None:
        nodata_mask = jnp.zeros(z32.shape, bool)
    neg = jnp.float32(-BIG)
    floor = jnp.where(nodata_mask, neg, z32)
    if w0 is None:
        w0 = jnp.where(nodata_mask, neg, jnp.float32(BIG))
    else:
        w0 = jnp.where(nodata_mask, neg, jnp.asarray(w0, jnp.float32))

    floor_p = _pad_to(floor, -BIG)  # pad cells drain: isolates interior
    w_p = _pad_to(w0, -BIG)
    eps = jnp.asarray(eps, jnp.float32)
    eps_d = eps if eps_diag is None else jnp.asarray(eps_diag, jnp.float32)
    eps2 = jnp.stack([eps, eps_d])

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_iters)

    def body(state):
        w, it, _ = state
        new = w
        for _ in range(check_every):
            new = minplus_rotation(new, floor_p, eps2)
        return new, it + check_every, jnp.all(new == w)

    done0 = jnp.any(w_p != w_p)
    w, iters, done = jax.lax.while_loop(cond, body,
                                        (w_p, jnp.int32(0), done0))
    filled = w[:h, :wd]
    return jnp.where(nodata_mask, z32, filled), iters, done


# ---------------------------------------------------------------------------
# D8 Gauss–Seidel accumulation
# ---------------------------------------------------------------------------

def _accum_down_kernel(w_ref, fd_ref, fdp_ref, fdn_ref, accn_ref, acc_ref,
                       out_ref, carry, *, bh):
    """One top→bottom GS sweep of ``A = w + Pᵀ A`` (strip-sequential).

    Mirrors ``richdem_tpu.ops.accum._gs_down_sweep``: contributions from
    the row above use NEW values (the carry); within-row and next-row use
    the sweep-start values.  fdp/fdn are the ±1-row-shifted code rasters,
    precomputed once per orientation."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)

    zero = jnp.float32(0.0)

    def row_body(r, prev_new):
        sl = (pl.ds(r, 1), slice(None))
        w_l = w_ref[sl]
        fd_l = fd_ref[sl]
        fdp = fdp_ref[sl]
        fdn = fdn_ref[sl]
        a_l = acc_ref[sl]
        a_n = accn_ref[sl]
        # NEW from the row above: S(7) straight, SE(6) arrives from the
        # west source, SW(8) from the east source.
        newc = (prev_new * (fdp == 7)
                + _shift_east(prev_new * (fdp == 6), zero)
                + _shift_west(prev_new * (fdp == 8), zero))
        # OLD from the row below: N(3) straight, NE(4) from the west
        # source, NW(2) from the east source.
        oldb = (a_n * (fdn == 3)
                + _shift_east(a_n * (fdn == 4), zero)
                + _shift_west(a_n * (fdn == 2), zero))
        # OLD within the row: E(5) from the west neighbor, W(1) from east.
        oldl = (_shift_east(a_l * (fd_l == 5), zero)
                + _shift_west(a_l * (fd_l == 1), zero))
        new = w_l + newc + oldb + oldl
        out_ref[sl] = new
        return new

    carry[...] = jax.lax.fori_loop(0, bh, row_body, carry[...])


def _accum_sweep_down(acc, w, fd, fdp, fdn):
    h, wd = acc.shape
    bh = _strip_height(wd, n_bufs=7)
    assert h % bh == 0, (h, bh)
    accn = jnp.concatenate([acc[1:], jnp.zeros_like(acc[:1])], axis=0)
    def blk():
        return pl.BlockSpec((bh, wd), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_accum_down_kernel, bh=bh),
        out_shape=jax.ShapeDtypeStruct((h, wd), jnp.float32),
        grid=(h // bh,),
        in_specs=[blk() for _ in range(6)],
        out_specs=blk(),
        scratch_shapes=[pltpu.VMEM((1, wd), jnp.float32)],
    )(w, fd, fdp, fdn, accn, acc)


def _roll_up(x):
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)


def _roll_down(x):
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def accum_rotation(acc, w, wt, fd_oriented):
    """One S/N/E/W rotation of GS sweeps (Pallas strip kernels)."""
    fd, fdp, fdn = fd_oriented["id"]
    acc = _accum_sweep_down(acc, w, fd, fdp, fdn)
    fd, fdp, fdn = fd_oriented["ud"]
    acc = jnp.flipud(_accum_sweep_down(jnp.flipud(acc), jnp.flipud(w),
                                       fd, fdp, fdn))
    fd, fdp, fdn = fd_oriented["tr"]
    acc = _accum_sweep_down(acc.T, wt, fd, fdp, fdn).T
    fd, fdp, fdn = fd_oriented["trud"]
    acc = jnp.flipud(_accum_sweep_down(
        jnp.flipud(acc.T), jnp.flipud(wt), fd, fdp, fdn)).T
    return acc


#: code permutations under grid transforms (as in ops.accum)
_PERM_FLIPUD = np.array([0, 1, 8, 7, 6, 5, 4, 3, 2], np.int8)
_PERM_TRANSPOSE = np.array([0, 3, 2, 1, 8, 7, 6, 5, 4], np.int8)


def _remap(fd, perm):
    table = jnp.asarray(perm).astype(jnp.int32)
    return table[fd.clip(0)]


def _orient_flowdirs(fd):
    """Precompute (fd, fd_prev_row, fd_next_row) int32 rasters for all 4
    orientations.  Nodata (<0) behaves as NO_FLOW (0) here — nodata cells
    carry weight 0, so absorbing their (zero) inflow is equivalent."""
    out = {}
    fd = jnp.asarray(fd).astype(jnp.int32).clip(0)
    fid = fd
    fud = jnp.flipud(_remap(fd, _PERM_FLIPUD))
    ftr = _remap(fd, _PERM_TRANSPOSE).T
    ftrud = jnp.flipud(_remap(ftr, _PERM_FLIPUD))
    for key, f in (("id", fid), ("ud", fud), ("tr", ftr), ("trud", ftrud)):
        out[key] = (f, _roll_down(f), _roll_up(f))
    return out


@functools.partial(jax.jit, static_argnames=("max_rotations",))
def _accum_gs_pallas_impl(fd, weights, max_rotations):
    h, wd = fd.shape
    fd_p = _pad_to(jnp.asarray(fd, jnp.int32), 0)
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0)
    oriented = _orient_flowdirs(fd_p)
    wt_p = w_p.T

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_rotations)

    def body(state):
        acc, it, _ = state
        new = accum_rotation(acc, w_p, wt_p, oriented)
        return new, it + 1, jnp.all(new == acc)

    done0 = jnp.any(w_p != w_p)
    acc, iters, done = jax.lax.while_loop(cond, body,
                                          (w_p, jnp.int32(0), done0))
    return acc[:h, :wd], iters, done


def d8_accumulation_gs(flowdirs, weights=None, no_data_mask=None,
                       max_rotations=64, return_info=False):
    """Exact D8 accumulation via Pallas GS line sweeps (TPU fast path).

    Same result as the oracle's topological queue; converges in a few
    rotations on real terrain (one rotation resolves every monotone
    flow-path segment)."""
    fd = jnp.asarray(flowdirs)
    h, wd = fd.shape
    if weights is None:
        weights = jnp.ones((h, wd), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    if no_data_mask is not None:
        weights = jnp.where(jnp.asarray(no_data_mask), 0.0, weights)
    acc, iters, done = _accum_gs_pallas_impl(fd, weights, max_rotations)
    from richdem_tpu.ops.pallas_folded import _require_converged
    _require_converged(done, "D8 GS accumulation", max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc


# ---------------------------------------------------------------------------
# Masked unit-cost distance transforms (flat resolution's BFS fields)
# ---------------------------------------------------------------------------
#
# The flat-resolution fixpoints (ops/flats.py, appendix A.3) are unit-cost
# shortest-path problems restricted to edges between equal-elevation cells
# with particular per-cell flags.  Instead of materializing (8, H, W) cost
# planes (the XLA engine's approach — 8 full rasters of traffic per sweep),
# the kernel recomputes edge admissibility in-flight from two compact
# per-cell rasters: the elevation (nodata → +ZBIG sentinel) and an int32
# flag bitmask.  Modes (matching oracle/flats.py BFS edge rules):
#
#   MEMBER  : z_c == z_n and data(c) and data(n)             step 1
#   TOWARDS : z_eq and noflow&in_flat(c) and in_flat(n)      step 1
#   AWAY    : z_eq and noflow&in_flat(c) and noflow&in_flat(n)  step 1
#   MAXD    : z_eq and in_flat(c) and in_flat(n)             step 0
#             (min-plus on -D: per-flat max propagation)

_F_DATA, _F_NOFLOW, _F_INFLAT = 1, 2, 4
_DIST_MODES = ("member", "towards", "away", "maxd")


def _allowed(mode, z, zn, s, sn):
    """Edge admissibility n→c per mode (z/s = cell, zn/sn = neighbor)."""
    z_eq = (z == zn) & (z < jnp.float32(2.9e37)) & (zn < jnp.float32(2.9e37))
    if mode == "member":
        return z_eq & ((s & _F_DATA) > 0) & ((sn & _F_DATA) > 0)
    nf_in = _F_NOFLOW | _F_INFLAT
    if mode == "towards":
        return z_eq & ((s & nf_in) == nf_in) & ((sn & _F_INFLAT) > 0)
    if mode == "away":
        return z_eq & ((s & nf_in) == nf_in) & ((sn & nf_in) == nf_in)
    if mode == "maxd":
        return z_eq & ((s & _F_INFLAT) > 0) & ((sn & _F_INFLAT) > 0)
    raise ValueError(mode)


def _dist_down_kernel(w_ref, z_ref, zu_ref, s_ref, su_ref, out_ref, carry,
                      *, bh, mode, step):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.full(carry.shape, BIG, carry.dtype)  # no off-grid

    big = jnp.float32(BIG)
    zbig = jnp.float32(3.0e37)
    stepf = jnp.float32(step)

    def row_body(r, prev):
        sl = (pl.ds(r, 1), slice(None))
        wr = w_ref[sl]
        z = z_ref[sl]
        zu = zu_ref[sl]
        s = s_ref[sl]
        su = su_ref[sl]
        cand = jnp.where(_allowed(mode, z, zu, s, su), prev + stepf, big)
        a_nw = _allowed(mode, z, _shift_east(zu, zbig), s,
                        _shift_east(su, 0))
        cand = jnp.minimum(cand, jnp.where(
            a_nw, _shift_east(prev, big) + stepf, big))
        a_ne = _allowed(mode, z, _shift_west(zu, zbig), s,
                        _shift_west(su, 0))
        cand = jnp.minimum(cand, jnp.where(
            a_ne, _shift_west(prev, big) + stepf, big))
        new = jnp.minimum(wr, cand)
        out_ref[sl] = new
        return new

    carry[...] = jax.lax.fori_loop(0, bh, row_body, carry[...])


def _dist_sweep_down(w, z, zu, s, su, mode, step):
    h, wd = w.shape
    bh = _strip_height(wd, n_bufs=6)
    assert h % bh == 0, (h, bh)

    def blk():
        return pl.BlockSpec((bh, wd), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_dist_down_kernel, bh=bh, mode=mode, step=step),
        out_shape=jax.ShapeDtypeStruct((h, wd), jnp.float32),
        grid=(h // bh,),
        in_specs=[blk() for _ in range(5)],
        out_specs=blk(),
        scratch_shapes=[pltpu.VMEM((1, wd), jnp.float32)],
    )(w, z, zu, s, su)


def _shift_rows_down(x, fill):
    """x[r-1] at row r (previous row), `fill` row at the top."""
    top = jnp.full((1, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([top, x[:-1]], axis=0)


def _dist_rotation(w, ctx, mode, step):
    """Down/up/right/left masked-distance GS rotation."""
    z, zu, zd, s, su, sd, zt, ztu, ztd, st, stu, std = ctx
    w = _dist_sweep_down(w, z, zu, s, su, mode, step)
    w = jnp.flipud(_dist_sweep_down(jnp.flipud(w), jnp.flipud(z),
                                    jnp.flipud(zd), jnp.flipud(s),
                                    jnp.flipud(sd), mode, step))
    wt = _dist_sweep_down(w.T, zt, ztu, st, stu, mode, step)
    wt = jnp.flipud(_dist_sweep_down(jnp.flipud(wt), jnp.flipud(zt),
                                     jnp.flipud(ztd), jnp.flipud(st),
                                     jnp.flipud(std), mode, step))
    return wt.T


def _dist_context(zed, state):
    """Precompute padded/shifted/transposed elevation+flag rasters shared
    by every distance fixpoint of one resolve-flats call."""
    zbig = 3.0e37
    z = _pad_to(jnp.asarray(zed, jnp.float32), zbig)
    s = _pad_to(jnp.asarray(state, jnp.int32), 0)
    zt, st = z.T, s.T
    return (z, _shift_rows_down(z, zbig),
            jnp.concatenate([z[1:], jnp.full((1, z.shape[1]), zbig,
                                             z.dtype)], axis=0),
            s, _shift_rows_down(s, 0),
            jnp.concatenate([s[1:], jnp.zeros((1, s.shape[1]),
                                              s.dtype)], axis=0),
            zt, _shift_rows_down(zt, zbig),
            jnp.concatenate([zt[1:], jnp.full((1, zt.shape[1]), zbig,
                                              zt.dtype)], axis=0),
            st, _shift_rows_down(st, 0),
            jnp.concatenate([st[1:], jnp.zeros((1, st.shape[1]),
                                               st.dtype)], axis=0))


def dist_fixpoint_pallas(w0, ctx, mode, step=1.0, max_iters=256,
                         return_info=False):
    """Iterate masked-distance rotations to convergence (monotone min).
    ``return_info`` additionally returns ``(iters, converged)``."""
    h, wd = w0.shape
    w_p = _pad_to(jnp.asarray(w0, jnp.float32), BIG)

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_iters)

    def body(state):
        w, it, _ = state
        new = _dist_rotation(w, ctx, mode, step)
        return new, it + 1, jnp.all(new == w)

    done0 = jnp.any(w_p != w_p)
    w, iters, done = jax.lax.while_loop(cond, body,
                                        (w_p, jnp.int32(0), done0))
    if return_info:
        return w[:h, :wd], iters, done
    return w[:h, :wd]
