"""Pallas GS accumulation over (H, W, 8) flow proportions (multi-flow).

Device fast path for ``FlowAccumFromProps`` / divergent metrics (D∞,
Quinn, Freeman, Holmgren, Seibert–McGlynn).  The XLA Jacobi fixpoint
(:func:`richdem_tpu.ops.accum.accumulation_jacobi_info`) needs one
iteration per flow-path step — O(grid size) on river networks — while a
Gauss–Seidel line sweep resolves every monotone path segment per pass,
converging in a few down/up/right/left rotations exactly like the D8
kernel in :mod:`richdem_tpu.ops.pallas_sweeps`.

GS splitting: processing rows in sweep order, contributions from the
already-processed neighbor row use NEW values; the not-yet-processed row
and the in-row neighbors use sweep-start values.  ``A = w + Pᵀ A`` with
nilpotent P (post-fill DAG) ⇒ monotone nondecreasing convergence to the
exact topological-queue result (oracle-gated in tests/test_pallas.py).

Proportions are stored plane-major ``(8, H, W)`` — each directional sweep
streams only the planes it needs; the reference's ``Array3D`` cell-major
layout would make every plane read strided.  A transposed copy serves the
two horizontal sweeps (flips are free: the reverse sweep re-walks strips
in reverse grid order instead of materializing flipped rasters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu.ops.pallas_sweeps import (_pad_to, _shift_east,
                                           _shift_west, _strip_height)

__all__ = ["mfd_accumulation_gs"]

#: original D8 code d acts as PERM_TRANSPOSE[d] on the transposed grid
#: (involution: W↔N, NE↔SW, E↔S; NW, SE fixed).
_PERM_TRANSPOSE = (0, 3, 2, 1, 8, 7, 6, 5, 4)


def _mfd_kernel(acc_ref, accx_ref, w_ref,
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


def _mfd_sweep(acc, w, props8, reverse):
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
        functools.partial(_mfd_kernel, bh=bh, reverse=reverse),
        out_shape=jax.ShapeDtypeStruct((h, wd), jnp.float32),
        grid=(n,),
        in_specs=in_specs,
        out_specs=grid_blk(smap),
        scratch_shapes=[pltpu.VMEM((4, wd), jnp.float32)],
    )(acc, acc, w, *([props8] * 11))


def _transpose_props(props8):
    """props8 for the transposed grid: plane d' = PERM_TRANSPOSE[d]."""
    idx = np.array([_PERM_TRANSPOSE[d] - 1 for d in range(1, 9)])
    return props8[jnp.asarray(idx)].transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("max_rotations",))
def _mfd_gs_impl(props8, weights, max_rotations):
    h, wd = weights.shape
    props_p = jnp.stack([_pad_to(props8[d], 0.0) for d in range(8)])
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0)
    props_t = _transpose_props(props_p)
    wt_p = w_p.T

    def rotation(acc):
        acc = _mfd_sweep(acc, w_p, props_p, reverse=False)
        acc = _mfd_sweep(acc, w_p, props_p, reverse=True)
        acc = _mfd_sweep(acc.T, wt_p, props_t, reverse=False)
        acc = _mfd_sweep(acc, wt_p, props_t, reverse=True).T
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


def mfd_accumulation_gs(props, weights=None, no_data_mask=None,
                        max_rotations=64):
    """Weighted upstream accumulation from (H, W, 8) proportions — Pallas
    GS line sweeps (exact; same result as the oracle's topological queue).
    """
    props = jnp.asarray(props)
    h, wd = props.shape[:2]
    props8 = jnp.moveaxis(props.astype(jnp.float32), -1, 0)
    if weights is None:
        weights = jnp.ones((h, wd), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    if no_data_mask is not None:
        weights = jnp.where(jnp.asarray(no_data_mask), 0.0, weights)
    acc, _, _ = _mfd_gs_impl(props8, weights, max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    return acc
