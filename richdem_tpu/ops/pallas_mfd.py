"""Pallas GS accumulation over (H, W, 8) flow proportions (multi-flow).

Device fast path for ``FlowAccumFromProps`` / divergent metrics (D∞,
Quinn, Freeman, Holmgren, Seibert–McGlynn).  The XLA Jacobi fixpoint
(:func:`richdem_tpu.ops.accum.accumulation_jacobi_info`) needs one
iteration per flow-path step — O(grid size) on river networks — while a
Gauss–Seidel line sweep resolves every monotone path segment per pass,
converging in a few down/up/right/left rotations exactly like the D8
kernel.

GS splitting: processing rows in sweep order, contributions from the
already-processed neighbor row use NEW values; the not-yet-processed row
and the in-row neighbors use sweep-start values.  ``A = w + Pᵀ A`` with
nilpotent P (post-fill DAG) ⇒ monotone nondecreasing convergence to the
exact topological-queue result (oracle-gated in tests/test_pallas.py).

Layout: proportions are plane-major ``(8, H, W)`` and every raster is
**folded** ``(H, W) → (H·8, W/8)`` (see ops/pallas_folded.py — one
original row becomes an (8, L) group filling whole vregs; the reference's
``Array3D`` cell-major layout would make every plane read strided AND
leave 7/8 of the VPU idle).  Up-sweeps re-walk strips in reverse grid
order; the two horizontal sweeps use a plane-permuted transposed copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu.ops.pallas_folded import (_F, _FOLD_MIN, _FOLD_PAD, _fold,
                                           _fold_strip_height,
                                           _gshift_east, _gshift_west,
                                           _require_converged, _unfold)
from richdem_tpu.ops.pallas_sweeps import (_pad_to, _shift_east,
                                           _shift_west, _strip_height)

__all__ = ["mfd_accumulation_gs"]

#: original D8 code d acts as PERM_TRANSPOSE[d] on the transposed grid
#: (involution: W↔N, NE↔SW, E↔S; NW, SE fixed).
_PERM_TRANSPOSE = (0, 3, 2, 1, 8, 7, 6, 5, 4)


def _mfd_kernel(acc_ref, accx_ref, w_ref,
                p1, p2, p3, p4, p5, p6, p7, p8,
                px_a, px_b, px_c,
                out_ref, flag_ref, carry, *, bh, f, reverse):
    """One directional GS sweep on folded groups.

    forward: NEW side = processed row above (source outflow planes toward
    us: straight S=7, SE=6 from the west source, SW=8 from the east);
    OLD side = row below (planes N=3, NE=4 west, NW=2 east); in-row OLD
    (planes E=5 from west, W=1 from east).  reverse swaps the plane trios
    and walks strips/rows bottom-up.  ``carry``: (4f, L) — the last
    processed group's new A and its three new-side plane rows."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)
        flag_ref[...] = jnp.zeros(flag_ref.shape, jnp.int32)

    zero = jnp.float32(0.0)
    if not reverse:
        new_planes = (p7, p6, p8)
        old_planes = (p3, p4, p2)
    else:
        new_planes = (p3, p4, p2)
        old_planes = (p7, p6, p8)

    def row_body(k, state):
        prev, diff = state
        r = (bh - 1 - k) if reverse else k
        sl = (0, pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        asl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        a_l = acc_ref[asl]
        w_l = w_ref[asl]
        fd1 = p1[sl]
        fd5 = p5[sl]

        prev_a = prev[0:f]
        newc = (prev_a * prev[f:2 * f]
                + _gshift_east(prev_a * prev[2 * f:3 * f], zero, f)
                + _gshift_west(prev_a * prev[3 * f:4 * f], zero, f))

        ro = r - 1 if reverse else r + 1
        in_strip = (ro >= 0) & (ro < bh)
        rs = pl.multiple_of(jnp.clip(ro, 0, bh - 1) * f, f)
        at_edge = i == n - 1

        # adjacent-strip boundary group rides in as (f, L)/(1, f, L)
        # blocks (index-mapped) — only those f rows are ever read
        a_o = jnp.where(in_strip, acc_ref[pl.ds(rs, f), :],
                        accx_ref[...])
        o_s = jnp.where(in_strip, old_planes[0][0, pl.ds(rs, f), :],
                        px_a[0])
        o_w = jnp.where(in_strip, old_planes[1][0, pl.ds(rs, f), :],
                        px_b[0])
        o_e = jnp.where(in_strip, old_planes[2][0, pl.ds(rs, f), :],
                        px_c[0])
        a_o = a_o * jnp.logical_or(in_strip, jnp.logical_not(at_edge))

        oldb = (a_o * o_s
                + _gshift_east(a_o * o_w, zero, f)
                + _gshift_west(a_o * o_e, zero, f))
        oldl = (_gshift_east(a_l * fd5, zero, f)     # west nbr flowing E
                + _gshift_west(a_l * fd1, zero, f))  # east nbr flowing W
        new = w_l + newc + oldb + oldl
        out_ref[asl] = new
        return (jnp.concatenate(
            [new, new_planes[0][sl], new_planes[1][sl],
             new_planes[2][sl]], axis=0),
            diff | (new != a_l).astype(jnp.int32))

    fin, diff = jax.lax.fori_loop(
        0, bh, row_body,
        (carry[...], jnp.zeros((f, acc_ref.shape[-1]), jnp.int32)))
    carry[...] = fin

    @pl.when(jnp.any(diff != 0))
    def _():
        flag_ref[...] = jnp.ones(flag_ref.shape, jnp.int32)


def _mfd_sweep(acc, w, props8, f, reverse):
    """One directional sweep; ``props8``: (8, H·f, W/f) folded planes."""
    from richdem_tpu.ops.pallas_folded import _strip_maps

    hf, L = acc.shape
    h = hf // f
    bh = _fold_strip_height(h, L * f, n_bufs=12)
    n = h // bh
    smap, xgroup = _strip_maps(n, bh, reverse)

    def grid_blk(m):
        return pl.BlockSpec((bh * f, L), lambda i, _m=m: (_m(i), 0),
                            memory_space=pltpu.VMEM)

    def xblk():
        return pl.BlockSpec((f, L), lambda i: (xgroup(i), 0),
                            memory_space=pltpu.VMEM)

    def plane_blk(d):
        return pl.BlockSpec((1, bh * f, L),
                            lambda i, _d=d: (_d, smap(i), 0),
                            memory_space=pltpu.VMEM)

    def plane_xblk(d):
        return pl.BlockSpec((1, f, L),
                            lambda i, _d=d: (_d, xgroup(i), 0),
                            memory_space=pltpu.VMEM)

    # old-side planes (0-based) at the adjacent strip: forward {3,4,2}-1,
    # reverse {7,6,8}-1
    old_set = (2, 3, 1) if not reverse else (6, 5, 7)
    in_specs = (
        [grid_blk(smap), xblk(), grid_blk(smap)]
        + [plane_blk(d) for d in range(8)]
        + [plane_xblk(d) for d in old_set]
    )
    flag_blk = pl.BlockSpec((8, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out, flag = pl.pallas_call(
        functools.partial(_mfd_kernel, bh=bh, f=f, reverse=reverse),
        out_shape=[jax.ShapeDtypeStruct((hf, L), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        grid=(n,),
        in_specs=in_specs,
        out_specs=[grid_blk(smap), flag_blk],
        scratch_shapes=[pltpu.VMEM((4 * f, L), jnp.float32)],
    )(acc, acc, w, *([props8] * 11))
    return out, flag[0, 0]


def _refold_T(x, f):
    return _fold(_unfold(x, f).T, f)


@functools.partial(jax.jit, static_argnames=("max_rotations", "fold_pad"))
def _mfd_gs_impl(props8, weights, max_rotations, fold_pad=_FOLD_PAD):
    h, wd = weights.shape
    f = _F
    props_p = jnp.stack([
        _fold(_pad_to(props8[d], 0.0, mh=fold_pad, mw=fold_pad), f)
        for d in range(8)])
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0,
                  mh=fold_pad, mw=fold_pad)
    # transposed planes: plane d' = PERM_TRANSPOSE[d], spatially transposed
    idx = np.array([_PERM_TRANSPOSE[d] - 1 for d in range(1, 9)])
    props_t = jnp.stack([
        _fold(_unfold(props_p[int(i_)], f).T, f) for i_ in idx])
    w_v = _fold(w_p, f)
    w_t = _fold(w_p.T, f)

    # rotation-level equality convergence (per-sweep flags chatter for
    # float proportions — see pallas_folded._accum_folded_impl note)
    def rotation(acc):
        acc, _ = _mfd_sweep(acc, w_v, props_p, f, reverse=False)
        acc, _ = _mfd_sweep(acc, w_v, props_p, f, reverse=True)
        at = _refold_T(acc, f)
        at, _ = _mfd_sweep(at, w_t, props_t, f, reverse=False)
        at, _ = _mfd_sweep(at, w_t, props_t, f, reverse=True)
        return _refold_T(at, f)

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
    return _unfold(acc, f)[:h, :wd], iters, done


def mfd_accumulation_gs(props, weights=None, no_data_mask=None,
                        max_rotations=512, fold_min=None, fold_pad=None,
                        return_info=False, engine=None):
    """Weighted upstream accumulation from (H, W, 8) proportions — Pallas
    GS line sweeps (exact; same result as the oracle's topological queue).
    ``fold_min``/``fold_pad`` override the folded-kernel dispatch
    thresholds for interpret-mode tests.  ``engine`` pins
    ``"scan"``/``"folded"`` explicitly (None → the
    ``RICHDEM_TPU_ACCUM_ENGINE`` dispatch, whose ``auto`` default picks
    scan here — see the dispatch comment below).

    The default rotation cap is deliberately high: dispersive metrics
    (Quinn) need ~100 rotations at 2048² where D∞ needs ~11 — the loop
    exits at convergence, so a high cap only costs when it's needed,
    and an exceeded cap raises instead of silently truncating."""
    props = jnp.asarray(props)
    h, wd = props.shape[:2]
    props8 = jnp.moveaxis(props.astype(jnp.float32), -1, 0)
    if weights is None:
        weights = jnp.ones((h, wd), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    if no_data_mask is not None:
        weights = jnp.where(jnp.asarray(no_data_mask), 0.0, weights)
    fmin = _FOLD_MIN if fold_min is None else fold_min
    if max(h, wd) >= fmin:
        fpad = _FOLD_PAD if fold_pad is None else fold_pad
        from richdem_tpu.ops.pallas_folded import _accum_engine
        # auto -> scan: divergent metrics braid flow through both
        # vertical directions, so the folded rotation count grows with
        # the diameter (Quinn ~74 at 2048^2) while the 4-sweep scan
        # rotation stays flat (~7) — the O(1)-vs-O(diameter) gap
        # dwarfs the ~1.7x per-sweep scan cost.
        eng = engine if engine is not None else _accum_engine(auto="scan")
        if eng == "scan":
            from richdem_tpu.ops.pallas_scan import (_mfd_scan_impl,
                                                     _mfd_sweep_order,
                                                     _scan_depth,
                                                     _scan_unroll)
            acc, iters, done = _mfd_scan_impl(props8, weights,
                                              max_rotations,
                                              fold_pad=fpad,
                                              depth=_scan_depth(default=8),
                                              unroll=_scan_unroll(),
                                              order=_mfd_sweep_order())
        else:
            acc, iters, done = _mfd_gs_impl(props8, weights,
                                            max_rotations, fold_pad=fpad)
    else:
        acc, iters, done = _mfd_gs_impl_small(props8, weights,
                                              max_rotations)
    _require_converged(done, "MFD accumulation", max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc


# ---------------------------------------------------------------------------
# Unfolded variant for small grids (folding pads to 1024 multiples, which
# is wasteful below ~2k and prohibitive in interpret-mode tests)
# ---------------------------------------------------------------------------

def _mfd_kernel_small(acc_ref, accx_ref, w_ref,
                p1, p2, p3, p4, p5, p6, p7, p8,
                px_a, px_b, px_c,
                out_ref, carry, *, bh, reverse):
    """One directional GS sweep.

    forward (top→bottom): NEW side = row above (planes 6,7,8: S/SE/SW
    outflow reaching us), OLD side = row below (planes 2,3,4: N/NE/NW),
    in-row OLD (planes 1,5).  reverse swaps the roles and walks strips and
    rows bottom→top.  ``accx``/``px_*`` are the next-unprocessed strip's
    acc and old-side planes (for the strip-boundary row); ``carry`` holds
    [A_new; new-side planes] of the last processed row.
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)

    zero = jnp.float32(0.0)
    # new-side planes (read at the already-processed neighbor row) and
    # old-side planes (at the not-yet-processed neighbor row):
    #   forward: new = (straight 7, from-west 6, from-east 8) at r-1
    #            old = (straight 3, from-west 4, from-east 2) at r+1
    #   reverse: new = (3, 4, 2) at r+1;  old = (7, 6, 8) at r-1
    if not reverse:
        new_planes = (p7, p6, p8)
        old_planes = (p3, p4, p2)
    else:
        new_planes = (p3, p4, p2)
        old_planes = (p7, p6, p8)

    def row_body(k, prev):
        # prev = [A_new; straight/west/east new-side plane rows] (4, W)
        r = k if not reverse else bh - 1 - k
        sl = (pl.ds(r, 1), slice(None))
        a_l = acc_ref[sl]
        w_l = w_ref[sl]
        fd1 = p1[0, pl.ds(r, 1), :]
        fd5 = p5[0, pl.ds(r, 1), :]

        prev_a = prev[0:1]
        newc = (prev_a * prev[1:2]
                + _shift_east(prev_a * prev[2:3], zero)
                + _shift_west(prev_a * prev[3:4], zero))

        # old-side neighbor row: within the strip, or the adjacent strip's
        # boundary row; zero when the strip is at the spatial edge.
        ro = r + 1 if not reverse else r - 1
        in_strip = (ro >= 0) & (ro < bh)
        rs = jnp.clip(ro, 0, bh - 1)
        bd = 0 if not reverse else bh - 1  # boundary row of the x-strip
        at_edge = i == n - 1

        a_in = acc_ref[pl.ds(rs, 1), :]
        a_x = accx_ref[pl.ds(bd, 1), :]
        o_s = jnp.where(in_strip, old_planes[0][0, pl.ds(rs, 1), :],
                        px_a[0, pl.ds(bd, 1), :])
        o_w = jnp.where(in_strip, old_planes[1][0, pl.ds(rs, 1), :],
                        px_b[0, pl.ds(bd, 1), :])
        o_e = jnp.where(in_strip, old_planes[2][0, pl.ds(rs, 1), :],
                        px_c[0, pl.ds(bd, 1), :])
        valid = jnp.logical_or(in_strip, jnp.logical_not(at_edge))
        a_o = jnp.where(in_strip, a_in, a_x) * valid

        oldb = (a_o * o_s
                + _shift_east(a_o * o_w, zero)
                + _shift_west(a_o * o_e, zero))
        oldl = (_shift_east(a_l * fd5, zero)      # west nbr flowing E
                + _shift_west(a_l * fd1, zero))   # east nbr flowing W
        new = w_l + newc + oldb + oldl
        out_ref[sl] = new
        # carry this row's new-side planes for the next row / next strip
        np_s = new_planes[0][0, pl.ds(r, 1), :]
        np_w = new_planes[1][0, pl.ds(r, 1), :]
        np_e = new_planes[2][0, pl.ds(r, 1), :]
        return jnp.concatenate([new, np_s, np_w, np_e], axis=0)

    carry[...] = jax.lax.fori_loop(0, bh, row_body, carry[...])


def _mfd_sweep_small(acc, w, props8, reverse):
    """One directional sweep; ``props8``: (8, H, W) plane-major."""
    h, wd = acc.shape
    bh = _strip_height(wd, n_bufs=15)
    assert h % bh == 0, (h, bh)
    n = h // bh

    if not reverse:
        def smap(i):  # strip processed at step i
            return i

        def xmap(i):  # next-unprocessed (spatially below)
            return jnp.minimum(i + 1, n - 1)
    else:
        def smap(i):
            return n - 1 - i

        def xmap(i):
            return jnp.maximum(n - 1 - i - 1, 0)

    def grid_blk(m):
        return pl.BlockSpec((bh, wd), lambda i: (m(i), 0),
                            memory_space=pltpu.VMEM)

    def plane_blk(d, m):
        return pl.BlockSpec((1, bh, wd), lambda i, _d=d, _m=m: (_d, _m(i), 0),
                            memory_space=pltpu.VMEM)

    old_set = (2, 3, 1) if not reverse else (6, 5, 7)  # 0-based {3,4,2}/{7,6,8}
    in_specs = (
        [grid_blk(smap), grid_blk(xmap), grid_blk(smap)]
        + [plane_blk(d, smap) for d in range(8)]
        + [plane_blk(d, xmap) for d in old_set]
    )
    return pl.pallas_call(
        functools.partial(_mfd_kernel_small, bh=bh, reverse=reverse),
        out_shape=jax.ShapeDtypeStruct((h, wd), jnp.float32),
        grid=(n,),
        in_specs=in_specs,
        out_specs=grid_blk(smap),
        scratch_shapes=[pltpu.VMEM((4, wd), jnp.float32)],
    )(acc, acc, w, *([props8] * 11))


def _transpose_props_small(props8):
    """props8 for the transposed grid: plane d' = PERM_TRANSPOSE[d]."""
    idx = np.array([_PERM_TRANSPOSE[d] - 1 for d in range(1, 9)])
    return props8[jnp.asarray(idx)].transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("max_rotations",))
def _mfd_gs_impl_small(props8, weights, max_rotations):
    h, wd = weights.shape
    props_p = jnp.stack([_pad_to(props8[d], 0.0) for d in range(8)])
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0)
    props_t = _transpose_props_small(props_p)
    wt_p = w_p.T

    def rotation(acc):
        acc = _mfd_sweep_small(acc, w_p, props_p, reverse=False)
        acc = _mfd_sweep_small(acc, w_p, props_p, reverse=True)
        acc = _mfd_sweep_small(acc.T, wt_p, props_t, reverse=False)
        acc = _mfd_sweep_small(acc, wt_p, props_t, reverse=True).T
        return acc

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_rotations)

    def body(state):
        acc, it, _ = state
        new = rotation(acc)
        return new, it + 1, jnp.all(new == acc)

    done0 = jnp.any(w_p != w_p)
    acc, iters, done = jax.lax.while_loop(cond, body,
                                          (w_p, jnp.int32(0), done0))
    return acc[:h, :wd], iters, done


