"""D∞-specialized two-tap folded accumulation (Pallas, TPU fast path).

Tarboton D∞ (reference ``flowmet/Tarboton1997.hpp`` / ``methods/
dinf_methods.hpp`` — SURVEY.md §2.2, appendix A.5) splits each cell's
outflow between exactly TWO cyclically-adjacent D8 directions.  The
generic multi-flow kernel (:mod:`richdem_tpu.ops.pallas_mfd`) hauls all
8 proportion planes (+3 index-mapped adjacent-strip planes) through VMEM
every sweep — 14 blocks/cell·sweep.  This kernel stores the flow field
as two compact rasters instead:

    ``code`` (int32, 0 = NO_FLOW) and ``p`` (f32): proportion ``p`` to
    direction ``code``, proportion ``1-p`` to ``next(code) = code%8+1``

and computes tap weights in-flight.  The two fields are PACKED into one
f32 raster ``v = code + p/2`` (0 = NO_FLOW): values stay ≤ 8.5, so the
mantissa still resolves p to ~2e-6 — far below the f32 rounding already
inherent in the accumulation — and each sweep moves only 6 VMEM blocks
(w, v, v_adj, acc, acc_adj, out) instead of the generic kernel's 14
(~2.3× traffic cut) with the same Gauss–Seidel fixpoint and rotation
count.

Orientation algebra: under the grid transpose the D8 permutation
``_PERM_TRANSPOSE`` is a reflection, so the cyclic pair (code, next)
reverses direction; the transposed representation is
``code' = PERM[next(code)]``, ``p' = 1 - p`` (taps (code', next(code'))
= (PERM[next], PERM[code]) with weights (1-p, p) — verified exactly in
tests/test_pallas_folded.py against the oracle's topological queue).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu.ops.pallas_folded import (_F, _FOLD_MIN, _FOLD_PAD, _fold,
                                           _fold_strip_height, _gshift_east,
                                           _gshift_west, _remap_codes,
                                           _require_converged, _unfold)
from richdem_tpu.ops.pallas_sweeps import _PERM_TRANSPOSE, _pad_to

__all__ = ["dinf_two_tap", "dinf_accumulation_gs"]

#: D8 code at angle k·pi/4 — E, NE, N, NW, W, SW, S, SE (ops.flowdirs).
_OCTANT_DIRS = np.array([5, 4, 3, 2, 1, 8, 7, 6])


@jax.jit
def dinf_two_tap(angles):
    """(code, p) two-tap encoding of a D∞ angle raster.

    Decodes to exactly the same proportions as
    :func:`richdem_tpu.ops.flowdirs.proportions_from_dinf`: the angle's
    octant gives directions (d_lo, d_hi) = (OCTANT[k], OCTANT[k+1]) with
    weights (1-frac, frac); since d_hi = prev(d_lo) cyclically, this is
    (code, p) = (d_hi, frac) in (code, next(code)) form."""
    a = jnp.asarray(angles)
    quarter = jnp.asarray(jnp.pi / 4.0, a.dtype)
    k = jnp.floor(a / quarter).astype(jnp.int32) % 8
    frac = (a / quarter - jnp.floor(a / quarter)).astype(jnp.float32)
    octants = jnp.asarray(_OCTANT_DIRS, jnp.int32)
    flowing = a >= 0.0
    code = jnp.where(flowing, octants[(k + 1) % 8], 0)
    p = jnp.where(flowing, frac, 0.0)
    return code, p


#: p is snapped to this grid before packing: 0.5·p then becomes an exact
#: multiple of 2⁻¹⁸, representable verbatim next to ANY code 1..8 (worst
#: case needs 3+18 = 21 ≤ 23 mantissa bits) — and so is 0.5·(1-p) on the
#: transposed field, keeping the four sweep orientations numerically
#: identical (otherwise the equality convergence check could chatter).
_P_GRID = 131072.0  # 2^17


def pack_two_tap(code, p):
    """Pack (code, p) into one f32 raster ``v = code + p/2``; 0=NO_FLOW.

    p is quantized to 1/131072 (≈8e-6 — far below the accumulation's own
    f32 rounding); the packing and its transpose are then exact."""
    code = jnp.asarray(code)
    p = jnp.asarray(p, jnp.float32)
    p_q = jnp.clip(jnp.round(p * _P_GRID) / _P_GRID, 0.0, 1.0)
    return jnp.where(code > 0,
                     code.astype(jnp.float32) + 0.5 * p_q, 0.0)


def unpack_two_tap(v):
    """Inverse of :func:`pack_two_tap` (recovers the quantized p exactly)."""
    v = jnp.asarray(v, jnp.float32)
    c = jnp.floor(v).astype(jnp.int32)
    p = (v - jnp.floor(v)) * 2.0
    return c, jnp.where(c > 0, p, 0.0)


def two_tap_props(code, p):
    """(H, W, 8) proportions from the two-tap encoding (for oracles)."""
    code = jnp.asarray(code)
    p = jnp.asarray(p, jnp.float32)
    nxt = code % 8 + 1
    flow = (code > 0).astype(jnp.float32)
    return (jax.nn.one_hot(code - 1, 8, dtype=jnp.float32)
            * (p * flow)[..., None]
            + jax.nn.one_hot(nxt - 1, 8, dtype=jnp.float32)
            * ((1.0 - p) * flow)[..., None])


def _decode(v):
    """Hoisted decode of the packed field (ONE floor/cast/select per
    loaded group — the taps themselves are then two compares + a blend,
    keeping the kernel bandwidth-bound instead of VPU-bound)."""
    fl = jnp.floor(v)
    code = fl.astype(jnp.int32)
    p = (v - fl) * 2.0
    nxt = jnp.where(code == 8, 1, code + 1)
    nxt = jnp.where(code > 0, nxt, 0)  # NO_FLOW: neither tap matches
    return code, nxt, p


def _tap(dec, target):
    """Tap weight toward D8 direction ``target`` from a decoded group."""
    code, nxt, p = dec
    t = jnp.int32(target)
    return p * (code == t) + (1.0 - p) * (nxt == t)


def _dinf_kernel(w_ref, v_ref, vx_ref, acc_ref, accx_ref,
                 out_ref, flag_ref, s_acc, s_v, *, bh, f, reverse):
    """One directional GS sweep of ``A = w + Pᵀ A`` with packed two-tap P.

    Mirrors ``pallas_folded._accum_kernel``: contributions from the
    already-processed neighbor row use NEW values (the carries); the
    not-yet-processed row and in-row neighbors use sweep-start values;
    the adjacent strip's boundary group is index-mapped in."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        s_acc[...] = jnp.zeros(s_acc.shape, s_acc.dtype)
        s_v[...] = jnp.zeros(s_v.shape, s_v.dtype)
        flag_ref[...] = jnp.zeros(flag_ref.shape, jnp.int32)

    zero = jnp.float32(0.0)
    new_codes = (3, 4, 2) if reverse else (7, 6, 8)
    old_codes = (7, 6, 8) if reverse else (3, 4, 2)

    def row_body(k, carry_in):
        prev_a, prev_v, diff = carry_in
        r = (bh - 1 - k) if reverse else k
        sl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        a_l = acc_ref[sl]
        w_l = w_ref[sl]
        v_l = v_ref[sl]

        cs, cw, ce = new_codes
        dp = _decode(prev_v)
        newc = (prev_a * _tap(dp, cs)
                + _gshift_east(prev_a * _tap(dp, cw), zero, f)
                + _gshift_west(prev_a * _tap(dp, ce), zero, f))

        ro = r - 1 if reverse else r + 1
        in_strip = (ro >= 0) & (ro < bh)
        rs = pl.multiple_of(jnp.clip(ro, 0, bh - 1) * f, f)
        at_edge = i == n - 1
        a_o = jnp.where(in_strip, acc_ref[pl.ds(rs, f), :],
                        accx_ref[...])
        v_o = jnp.where(in_strip, v_ref[pl.ds(rs, f), :],
                        vx_ref[...])
        a_o = a_o * jnp.logical_or(in_strip, jnp.logical_not(at_edge))

        os_, ow, oe = old_codes
        do = _decode(v_o)
        dl = _decode(v_l)
        oldb = (a_o * _tap(do, os_)
                + _gshift_east(a_o * _tap(do, ow), zero, f)
                + _gshift_west(a_o * _tap(do, oe), zero, f))
        oldl = (_gshift_east(a_l * _tap(dl, 5), zero, f)
                + _gshift_west(a_l * _tap(dl, 1), zero, f))
        new = w_l + newc + oldb + oldl
        out_ref[sl] = new
        # vector-shaped change accumulation (see pallas_folded notes)
        return (new, v_l, diff | (new != a_l).astype(jnp.int32))

    fin = jax.lax.fori_loop(
        0, bh, row_body,
        (s_acc[...], s_v[...], jnp.zeros((f, acc_ref.shape[-1]),
                                         jnp.int32)))
    s_acc[...] = fin[0]
    s_v[...] = fin[1]

    @pl.when(jnp.any(fin[2] != 0))
    def _():
        flag_ref[...] = jnp.ones(flag_ref.shape, jnp.int32)


def _dinf_sweep(acc, w, v, f, reverse):
    from richdem_tpu.ops.pallas_folded import _strip_maps

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
        functools.partial(_dinf_kernel, bh=bh, f=f, reverse=reverse),
        out_shape=[jax.ShapeDtypeStruct((hf, L), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        grid=(n,),
        in_specs=[blk(smap), blk(smap), xblk(), blk(smap), xblk()],
        out_specs=[blk(smap), flag_blk],
        scratch_shapes=[pltpu.VMEM((f, L), jnp.float32),
                        pltpu.VMEM((f, L), jnp.float32)],
    )(w, v, v, acc, acc)
    return out, flag[0, 0]


def _transpose_two_tap(code, p):
    """Two-tap field of the transposed grid (see module docstring)."""
    nxt = jnp.where(code > 0, code % 8 + 1, 0)
    code_t = _remap_codes(nxt, _PERM_TRANSPOSE)
    p_t = jnp.where(code > 0, 1.0 - p, 0.0)
    return code_t.T, p_t.T


def _refold_T(x, f):
    return _fold(_unfold(x, f).T, f)


@functools.partial(jax.jit, static_argnames=("max_rotations", "fold_pad"))
def _dinf_gs_impl(code, p, weights, max_rotations, fold_pad=_FOLD_PAD):
    h, wd = weights.shape
    f = _F
    c_p = _pad_to(jnp.asarray(code, jnp.int32), 0, mh=fold_pad, mw=fold_pad)
    p_p = _pad_to(jnp.asarray(p, jnp.float32), 0.0, mh=fold_pad,
                  mw=fold_pad)
    # pack AFTER padding; the transposed field packs the transformed pair
    c_p, p_p = unpack_two_tap(pack_two_tap(c_p, p_p))  # quantize once
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0, mh=fold_pad,
                  mw=fold_pad)
    ct_p, pt_p = _transpose_two_tap(c_p, p_p)
    v_v = _fold(pack_two_tap(c_p, p_p), f)
    w_v = _fold(w_p, f)
    v_t = _fold(pack_two_tap(ct_p, pt_p), f)
    w_t = _fold(w_p.T, f)

    # rotation-level equality convergence: summation sweeps regroup the
    # float adds per orientation, so per-sweep change flags never settle
    # for fractional taps (see pallas_folded._accum_folded_impl note)
    def rotation(acc):
        acc, _ = _dinf_sweep(acc, w_v, v_v, f, reverse=False)
        acc, _ = _dinf_sweep(acc, w_v, v_v, f, reverse=True)
        at = _refold_T(acc, f)
        at, _ = _dinf_sweep(at, w_t, v_t, f, reverse=False)
        at, _ = _dinf_sweep(at, w_t, v_t, f, reverse=True)
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


def dinf_accumulation_gs(code, p, weights=None, no_data_mask=None,
                         max_rotations=512, fold_min=None, fold_pad=None,
                         return_info=False):
    """Exact D∞ accumulation from the two-tap encoding — same
    topological-queue result as the generic MFD path at ~half the HBM
    traffic.  Small grids fall back to the generic kernel via decoded
    proportions (folding pads to 1024 multiples).  Engine-dispatching at
    folded sizes: ``RICHDEM_TPU_ACCUM_ENGINE=scan`` routes to the
    scan-GS kernel (whose small-grid fallback re-enters here, hence the
    dispatch sits behind the size check)."""
    code = jnp.asarray(code)
    h, wd = code.shape
    fmin = _FOLD_MIN if fold_min is None else fold_min
    fpad = _FOLD_PAD if fold_pad is None else fold_pad
    if weights is None:
        weights = jnp.ones((h, wd), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    if no_data_mask is not None:
        weights = jnp.where(jnp.asarray(no_data_mask), 0.0, weights)
    if max(h, wd) < fmin:
        from richdem_tpu.ops.pallas_mfd import mfd_accumulation_gs
        return mfd_accumulation_gs(two_tap_props(code, p),
                                   weights=weights,
                                   no_data_mask=no_data_mask,
                                   max_rotations=max_rotations,
                                   return_info=return_info)
    from richdem_tpu.ops.pallas_folded import _accum_engine
    if _accum_engine(auto="scan") == "scan":
        from richdem_tpu.ops.pallas_scan import (_dinf_scan_impl,
                                                 _dinf_scan_rot,
                                                 _scan_depth,
                                                 _scan_unroll)
        v = pack_two_tap(code, jnp.asarray(p, jnp.float32))
        # same depth policy as pallas_scan.dinf_accumulation_scan:
        # fused depth-1 needs the 4-sweep rotation's transposed
        # backstop for long E/W chains
        rot4 = _dinf_scan_rot() == 4
        acc, iters, done = _dinf_scan_impl(v, weights, max_rotations,
                                           fold_pad=fpad, rot4=rot4,
                                           depth=_scan_depth(
                                               default=1 if rot4 else 16),
                                           unroll=_scan_unroll())
        _require_converged(done, "D-infinity scan accumulation",
                           max_rotations)
        if no_data_mask is not None:
            acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
        if return_info:
            return acc, iters, done
        return acc
    acc, iters, done = _dinf_gs_impl(code, p, weights, max_rotations,
                                     fold_pad=fpad)
    _require_converged(done, "D-infinity two-tap accumulation",
                       max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc
