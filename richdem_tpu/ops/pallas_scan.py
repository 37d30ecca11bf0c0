"""Scan-GS accumulation sweeps: 2 sweeps per rotation, no transposes.

The folded kernels (:mod:`richdem_tpu.ops.pallas_folded`) rotate through
4 directional sweeps plus 2 transpose refolds because a row sweep has no
within-row propagation — horizontal runs only resolve in the transposed
pass, and rotation counts are terrain-bound (D8 ~5-9, D∞ ~11-14, Quinn
~100 at 2048²; BASELINE.md r2 accounting).

Here each sweep ALSO resolves BOTH within-row directions with NEW
values via associative affine prefix scans: the in-row recurrences

    newE[j] = base[j] + gE[j] · newE[j-1],   gE[j] = [fd[j-1] = E]
    newW[j] = base[j] + gW[j] · newW[j+1],   gW[j] = [fd[j+1] = W]

are compositions of affine maps ``x → a·x + b``, so a Hillis–Steele
scan (log₂ W generalized lane shifts over the folded (f, L) row group)
evaluates each whole row exactly.  The two are INDEPENDENT — an E-chain
feeding a W-chain inside one row would require the 2-cycle
``fd[j] = E ∧ fd[j+1] = W``, impossible on an acyclic flow raster — so
they combine additively: ``new = newE + newW − base``.

A forward sweep therefore handles {S, SE, SW, E, W} with new values
(row above via the strip carry, both laterals via the scans) and an
upward sweep {N, NE, NW, E, W}: a rotation is TWO pallas calls, needs
no transposed layouts (no refolds, no remapped fd copies), and
converges in O(vertical direction alternations) rotations — a
serpentine path threading every cell resolves in ONE forward sweep
where the 4-sweep folded kernels needed one rotation per row pair.

The affine-map coefficients are floats, so the same kernel shape extends
to fractional taps (D∞ two-tap, generic MFD — ``a = p_E[j-1]``).
Convergence stays a rotation-level equality (summation sweeps regroup
float adds; per-sweep flags chatter — see pallas_folded notes).

Cites: reference ``methods/flow_accumulation_generic.hpp`` semantics
(SURVEY.md §2.2 generic accumulation row, appendix A.6); the scan is the
TPU-native replacement for its topological queue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from richdem_tpu.ops.pallas_folded import (_F, _FOLD_MIN, _FOLD_PAD,
                                           _fold, _fold_strip_height,
                                           _iotas, _require_converged,
                                           _strip_maps, _unfold)
from richdem_tpu.ops.pallas_sweeps import _pad_to
from richdem_tpu.ops.sweeps import BIG

__all__ = ["d8_accumulation_scan", "dinf_accumulation_scan",
           "mfd_accumulation_scan", "fill_fixpoint_scan"]


def _iota_ctx(shape):
    """Hoisted iota fields shared by every shift in a kernel (rebuilding
    them per scan step measurably slows the sweeps)."""
    lane, sub = _iotas(shape)
    L = shape[-1]
    return lane, sub * L + lane


def _win_lim(depth, w, seed):
    """(lim, seeding) for a truncated scan window: the power-of-two
    doubling limit and whether an old-value seed closes the window.
    Shared by the affine/clamp/tropical scans so the rounding stays in
    lockstep across engines."""
    lim = w if depth <= 0 else min(1 << max(0, (depth - 1)).bit_length(),
                                   w)
    return lim, seed is not None and lim < w


def _shift_fwd(x, k, fill, ctx=None):
    """Flattened row-major shift: out[flat j] = x[j-k] over the (f, L)
    group, ``fill`` for j < k.  k static, 1 ≤ k < f·L."""
    f, L = x.shape
    s, l = divmod(k, L)
    lane, flat = _iota_ctx(x.shape) if ctx is None else ctx
    if l:
        rolled = pltpu.roll(x, l, axis=1)
        a = pltpu.roll(rolled, s, axis=0) if s else rolled
        b = pltpu.roll(rolled, (s + 1) % f, axis=0)
        out = jnp.where(lane >= l, a, b)
    else:
        out = pltpu.roll(x, s, axis=0)
    return jnp.where(flat >= k, out, fill)


def _shift_rev(x, k, fill, ctx=None):
    """out[flat j] = x[j+k]; ``fill`` for j ≥ f·L − k."""
    f, L = x.shape
    s, l = divmod(k, L)
    lane, flat = _iota_ctx(x.shape) if ctx is None else ctx
    if l:
        rolled = pltpu.roll(x, L - l, axis=1)
        a = pltpu.roll(rolled, (f - s) % f, axis=0)
        b = pltpu.roll(rolled, (f - s - 1) % f, axis=0)
        out = jnp.where(lane < L - l, a, b)
    else:
        out = pltpu.roll(x, (f - s) % f, axis=0) if s else x
    return jnp.where(flat < f * L - k, out, fill)


def _affine_scan(gate, base, reverse, ctx=None, seed=None, depth=0):
    """Solve new[j] = base[j] + gate[j]·new[j∓1] exactly (row-local).

    Hillis–Steele composition of affine maps (a, b): after log₂(f·L)
    doubling steps, b carries the full-prefix result (x₀ = 0 beyond the
    row edge).

    ``depth`` > 0 truncates the composition at the next power of two ≥
    depth and closes the window with the OLD row values ``seed``:
    after the loop (a, b) at j represent the map over the last ``d``
    entries (new[j] = b[j] + a[j]·x[j∓d]), so seeding x with the old
    accumulation makes the sweep a hybrid GS/Jacobi update.  This stays
    EXACT at the fixpoint: a[j] > 0 requires an unbroken in-row chain
    over the window, along which no cell receives cross-chain inflow
    (a positive E proportion at m−1→m forbids a positive W proportion
    m→m−1 on a downhill flow field), so the chain's old values already
    equal the scan solution there; the rotation-level equality
    convergence then certifies the full fixpoint, trading ~log₂(W/d)
    scan steps per sweep against extra rotations for chains > d."""
    f, L = gate.shape
    w = f * L
    lim, seeding = _win_lim(depth, w, seed)
    if ctx is None:
        ctx = _iota_ctx(gate.shape)
    shift = _shift_rev if reverse else _shift_fwd
    a, b = gate, base
    d = 1
    while d < lim:
        b = a * shift(b, d, 0.0, ctx) + b
        if d * 2 < lim or seeding:
            # the last step's gate product is dead unless a seed
            # closes the window afterwards
            a = a * shift(a, d, 1.0, ctx)
        d *= 2
    if seeding:
        b = b + a * shift(seed, d, 0.0, ctx)
    return b


def _d8_tap(fd, target):
    return (fd == target).astype(jnp.float32)


def _dinf_prep(v):
    """Decode the packed two-tap field ``v = code + p/2`` (see
    ops.pallas_dinf) once per FIELD per row (three fields: carry, old
    row, lateral — the carry's decode is recomputed rather than carried
    through the loop state) instead of inside each of the 8 tap calls.
    Hardware-neutral at 4096² (Mosaic already CSE'd the in-row
    duplicates; tools/probe_r5.py) — kept as the cheaper-by-
    construction shape."""
    fl = jnp.floor(v)
    code = fl.astype(jnp.int32)
    p = (v - fl) * 2.0
    nxt = jnp.where(code == 8, 1, code + 1)
    nxt = jnp.where(code > 0, nxt, 0)
    return code, p, nxt


def _dinf_tap(decoded, target):
    """Two-tap weight toward D8 direction ``target`` from a
    ``_dinf_prep``-decoded field."""
    code, p, nxt = decoded
    t = jnp.int32(target)
    return p * (code == t) + (1.0 - p) * (nxt == t)


def _accum_scan_kernel(w_ref, fd_ref, fdx_ref, acc_ref, accx_ref,
                       out_ref, c_acc, c_fd, *, bh, f, reverse, tap,
                       prep=None, depth=0, unroll=1):
    """One scan-GS sweep of ``A = w + Pᵀ A``.

    forward: NEW side = processed row above (tap weights toward S=7
    straight, SE=6 from the west source, SW=8 from the east source)
    plus BOTH in-row chains via prefix scans; OLD side = row below
    (N=3, NE=4 west, NW=2 east).  reverse mirrors the row trios.
    ``tap(prep(field_group), target)`` abstracts the metric: D8 one-hot
    codes (prep = identity) or the D∞ packed two-tap field decoded once
    per row (``_dinf_prep``)."""
    if prep is None:
        prep = lambda x: x
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        c_acc[...] = jnp.zeros(c_acc.shape, c_acc.dtype)
        c_fd[...] = jnp.zeros(c_fd.shape, c_fd.dtype)

    zero = jnp.float32(0.0)
    new_codes = (3, 4, 2) if reverse else (7, 6, 8)
    old_codes = (7, 6, 8) if reverse else (3, 4, 2)
    ctx = _iota_ctx((f, acc_ref.shape[-1]))

    def row_body(k, carry_in):
        prev_a, prev_fd = carry_in
        r = (bh - 1 - k) if reverse else k
        sl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        w_l = w_ref[sl]
        fd_l = fd_ref[sl]
        d_prev = prep(prev_fd)

        cs, cw, ce = new_codes
        newc = (prev_a * tap(d_prev, cs)
                + _shift_fwd(prev_a * tap(d_prev, cw), 1, zero, ctx)
                + _shift_rev(prev_a * tap(d_prev, ce), 1, zero, ctx))

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
        d_o = prep(fd_o)

        os_, ow, oe = old_codes
        oldb = (a_o * tap(d_o, os_)
                + _shift_fwd(a_o * tap(d_o, ow), 1, zero, ctx)
                + _shift_rev(a_o * tap(d_o, oe), 1, zero, ctx))
        base = w_l + newc + oldb
        # both in-row chains with NEW values; independent (an E-chain
        # feeding a W-chain needs a 2-cycle), hence additive
        d_l = prep(fd_l)
        seed = acc_ref[sl] if depth else None
        if depth == 1:
            # fused one-step window: gE[j]·old[j−1] = (tap·old)[j−1],
            # one lane shift per direction instead of gate shift +
            # scan seed shift (the scan-kernel cost is these shifts)
            new = (base
                   + _shift_fwd(tap(d_l, 5) * seed, 1, zero, ctx)
                   + _shift_rev(tap(d_l, 1) * seed, 1, zero, ctx))
        else:
            gE = _shift_fwd(tap(d_l, 5), 1, zero, ctx)
            gW = _shift_rev(tap(d_l, 1), 1, zero, ctx)
            newE = _affine_scan(gE, base, reverse=False, ctx=ctx,
                                seed=seed, depth=depth)
            newW = _affine_scan(gW, base, reverse=True, ctx=ctx,
                                seed=seed, depth=depth)
            new = newE + newW - base
        out_ref[sl] = new
        return (new, fd_l)

    acc_fin, fd_fin = jax.lax.fori_loop(
        0, bh, row_body, (c_acc[...], c_fd[...]),
        unroll=bh if unroll == -1 else unroll)
    c_acc[...] = acc_fin
    c_fd[...] = fd_fin


def _accum_scan_sweep(acc, w, fd, f, reverse, tap=_d8_tap, prep=None,
                      depth=0, unroll=1):
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

    return pl.pallas_call(
        functools.partial(_accum_scan_kernel, bh=bh, f=f,
                          reverse=reverse, tap=tap, prep=prep,
                          depth=depth, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((hf, L), jnp.float32),
        grid=(n,),
        in_specs=[blk(smap), blk(smap), xblk(), blk(smap), xblk()],
        out_specs=blk(smap),
        scratch_shapes=[pltpu.VMEM((f, L), jnp.float32),
                        pltpu.VMEM((f, L), fd.dtype)],
    )(w, fd, fd, acc, acc)


def _scan_unroll(default=1):
    """``RICHDEM_TPU_SCAN_UNROLL``: unroll factor for the per-row
    Gauss-Seidel carry loop inside the scan kernels.  The loop runs H
    sequential iterations (one per logical row) whose bodies are short
    vector-op bursts, so loop/addressing overhead is a real fraction of
    sweep time; unrolling amortizes it without changing any result
    (pure tracing transform).  Mosaic only supports unroll=1 or a full
    unroll; ``-1`` requests the full unroll (resolved to the strip
    height per kernel)."""
    import os
    return int(os.environ.get("RICHDEM_TPU_SCAN_UNROLL", str(default)))


def _scan_depth(default=0):
    """``RICHDEM_TPU_SCAN_DEPTH``: truncate the in-row prefix scans at
    this chain length (0 = full row width — exact in one solve).
    Shorter depths drop log₂(W/depth) doubling steps per sweep and pay
    for in-row chains longer than the depth with extra rotations; the
    result stays exact either way (see ``_affine_scan``).  ``default``
    is the per-metric production default when the env var is unset —
    the per-metric production default when the env var is unset.
    Hardware-measured at 4096² (tools/probe_scan_opt.py r4,
    tools/probe_r5.py r5 on the eps=1e-2 bench surface): the generic
    MFD path wants 8 (Quinn 206 ms/19 rot vs 200/22 at depth 4 — even,
    but depths ≤ 2 blow up: 78-222 rotations); D∞ two-tap wants 1 (the
    fused one-shift lateral tap: 102 ms/14 rot vs 118/6 at depth 16 at
    4096², 213 vs 234 ms at 8192² — its sweeps are VPU-bound on the
    scan shift passes, and D∞ dispersal chains are short enough that
    the extra rotations stay cheap); D8 keeps the full-width scan
    (long in-row chains: depth 64 → 7 rotations, depth 8 → 41, both
    slower than the 12-step full scan at 4 rotations)."""
    import os
    return int(os.environ.get("RICHDEM_TPU_SCAN_DEPTH", str(default)))


@functools.partial(jax.jit,
                   static_argnames=("max_rotations", "fold_pad", "depth",
                                    "unroll"))
def _accum_scan_impl(fd, weights, max_rotations, fold_pad=_FOLD_PAD,
                     depth=0, unroll=1):
    h, wd = fd.shape
    fd_p = _pad_to(jnp.asarray(fd, jnp.int32).clip(0), 0,
                   mh=fold_pad, mw=fold_pad)
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0,
                  mh=fold_pad, mw=fold_pad)
    f = _F
    fd_v = _fold(fd_p, f)
    w_v = _fold(w_p, f)

    def rotation(acc):
        acc = _accum_scan_sweep(acc, w_v, fd_v, f, reverse=False,
                                depth=depth, unroll=unroll)
        return _accum_scan_sweep(acc, w_v, fd_v, f, reverse=True,
                                 depth=depth, unroll=unroll)

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


def _dinf_scan_rot():
    """Scan-engine D∞ rotation shape: ``RICHDEM_TPU_DINF_SCAN_ROT`` =
    ``2`` (row sweeps only — alternation-bound like the row-only MFD
    rotation, count grows with the diameter) or ``4`` (the default:
    row + column scan sweeps via the transposed packed field — flat
    rotation count; see ``_mfd_scan_impl``)."""
    import os
    return int(os.environ.get("RICHDEM_TPU_DINF_SCAN_ROT", "4"))


@functools.partial(jax.jit,
                   static_argnames=("max_rotations", "fold_pad", "rot4",
                                    "depth", "unroll"))
def _dinf_scan_impl(v, weights, max_rotations, fold_pad=_FOLD_PAD,
                    rot4=True, depth=0, unroll=1):
    """D∞ scan-GS fixpoint from the packed two-tap field.

    ``rot4`` adds the column scan sweeps on the transposed packed field
    (``pallas_dinf._transpose_two_tap`` — the CCW pair flips to CW under
    the reflection, so the pair (code, code+1, p) transposes to
    (T(code+1), T(code+1)+1, 1−p)), making the rotation count flat in
    the grid diameter exactly as for the generic MFD scan engine."""
    from richdem_tpu.ops.pallas_dinf import (_transpose_two_tap,
                                             pack_two_tap,
                                             unpack_two_tap)

    h, wd = weights.shape
    f = _F
    v_p = _pad_to(jnp.asarray(v, jnp.float32), 0.0, mh=fold_pad,
                  mw=fold_pad)
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0,
                  mh=fold_pad, mw=fold_pad)
    v_v = _fold(v_p, f)
    w_v = _fold(w_p, f)

    if rot4:
        c_p, p_p = unpack_two_tap(v_p)
        ct_p, pt_p = _transpose_two_tap(c_p, p_p)
        v_t = _fold(pack_two_tap(ct_p, pt_p), f)
        w_t = _fold(w_p.T, f)

        def _refold_T(x):
            return _fold(_unfold(x, f).T, f)

        def rotation(acc):
            acc = _accum_scan_sweep(acc, w_v, v_v, f, reverse=False,
                                    tap=_dinf_tap, prep=_dinf_prep, depth=depth,
                                    unroll=unroll)
            acc = _accum_scan_sweep(acc, w_v, v_v, f, reverse=True,
                                    tap=_dinf_tap, prep=_dinf_prep, depth=depth,
                                    unroll=unroll)
            at = _refold_T(acc)
            at = _accum_scan_sweep(at, w_t, v_t, f, reverse=False,
                                   tap=_dinf_tap, prep=_dinf_prep, depth=depth,
                                   unroll=unroll)
            at = _accum_scan_sweep(at, w_t, v_t, f, reverse=True,
                                   tap=_dinf_tap, prep=_dinf_prep, depth=depth,
                                   unroll=unroll)
            return _refold_T(at)
    else:
        def rotation(acc):
            acc = _accum_scan_sweep(acc, w_v, v_v, f, reverse=False,
                                    tap=_dinf_tap, prep=_dinf_prep, depth=depth,
                                    unroll=unroll)
            return _accum_scan_sweep(acc, w_v, v_v, f, reverse=True,
                                     tap=_dinf_tap, prep=_dinf_prep, depth=depth,
                                     unroll=unroll)

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


def _dinf_planes():
    """``RICHDEM_TPU_DINF_SCAN_PLANES=1``: route the D∞ scan engine
    through the generic MFD planes kernel (decoded proportions) instead
    of the packed two-tap kernel.  The planes sweep reads 8 proportion
    planes from HBM but does no per-row tap decode, so it is the
    cheaper shape when the kernels are VPU-bound rather than
    bandwidth-bound (hardware probe tools/probe_scan_opt.py)."""
    import os
    return os.environ.get("RICHDEM_TPU_DINF_SCAN_PLANES", "0") == "1"


def dinf_accumulation_scan(code, p, weights=None, no_data_mask=None,
                           max_rotations=512, fold_min=None,
                           fold_pad=None, return_info=False):
    """Exact D∞ accumulation from the two-tap encoding via scan-GS
    sweeps — 2 pallas calls per rotation, no transposed packed field.
    Same contract as ``pallas_dinf.dinf_accumulation_gs``."""
    from richdem_tpu.ops.pallas_dinf import pack_two_tap

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
        from richdem_tpu.ops.pallas_dinf import dinf_accumulation_gs
        return dinf_accumulation_gs(code, p, weights=weights,
                                    max_rotations=max_rotations,
                                    fold_min=fmin, fold_pad=fpad,
                                    return_info=return_info)
    if _dinf_planes():
        from richdem_tpu.ops.pallas_dinf import (two_tap_props,
                                                 unpack_two_tap)
        # quantize p through the packed encoding first so this route
        # computes the same fixpoint as the two-tap kernel bit-for-bit
        # at the proportion level (pack_two_tap stores p in the
        # fraction of code + p/2)
        cq, pq = unpack_two_tap(pack_two_tap(code,
                                             jnp.asarray(p, jnp.float32)))
        return mfd_accumulation_scan(two_tap_props(cq, pq),
                                     weights=weights,
                                     max_rotations=max_rotations,
                                     fold_min=fmin, fold_pad=fpad,
                                     return_info=return_info)
    v = pack_two_tap(code, p)
    # depth-1 fused laterals are the hardware winner under the 4-sweep
    # rotation, whose TRANSPOSED sweeps resolve arbitrarily long E/W
    # chains via the row carry; row-only (ROT=2) has no such backstop —
    # an exact-cardinal ramp would crawl 1 cell/sweep — so it keeps the
    # 16-step window.
    rot4 = _dinf_scan_rot() == 4
    acc, iters, done = _dinf_scan_impl(v, weights, max_rotations,
                                       fold_pad=fpad, rot4=rot4,
                                       depth=_scan_depth(
                                           default=1 if rot4 else 16),
                                       unroll=_scan_unroll())
    _require_converged(done, "scan-GS D-infinity accumulation",
                       max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc


def _mfd_scan_kernel(acc_ref, accx_ref, w_ref,
                     p1, p2, p3, p4, p5, p6, p7, p8,
                     px_a, px_b, px_c,
                     out_ref, carry, *, bh, f, reverse, depth=0,
                     unroll=1):
    """Scan-GS sweep over (8, H·f, L) folded proportion planes: previous
    row trio NEW via the carry, BOTH in-row chains NEW via the scans
    (gates = the neighbors' E/W proportions — float affine coefficients),
    next-row trio OLD.  See ops/pallas_mfd.py for the plane layout."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)

    zero = jnp.float32(0.0)
    if not reverse:
        new_planes = (p7, p6, p8)
        old_planes = (p3, p4, p2)
    else:
        new_planes = (p3, p4, p2)
        old_planes = (p7, p6, p8)
    ctx = _iota_ctx((f, acc_ref.shape[-1]))

    def row_body(k, prev):
        r = (bh - 1 - k) if reverse else k
        sl = (0, pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        asl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        w_l = w_ref[asl]
        fd1 = p1[sl]
        fd5 = p5[sl]

        prev_a = prev[0:f]
        newc = (prev_a * prev[f:2 * f]
                + _shift_fwd(prev_a * prev[2 * f:3 * f], 1, zero, ctx)
                + _shift_rev(prev_a * prev[3 * f:4 * f], 1, zero, ctx))

        ro = r - 1 if reverse else r + 1
        in_strip = (ro >= 0) & (ro < bh)
        rs = pl.multiple_of(jnp.clip(ro, 0, bh - 1) * f, f)
        at_edge = i == n - 1
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
                + _shift_fwd(a_o * o_w, 1, zero, ctx)
                + _shift_rev(a_o * o_e, 1, zero, ctx))
        base = w_l + newc + oldb
        seed = acc_ref[asl] if depth else None
        if depth == 1:
            # fused one-step window (see _accum_scan_kernel): the west
            # neighbor's E proportion times its old value is one shift
            new = (base
                   + _shift_fwd(fd5 * seed, 1, zero, ctx)
                   + _shift_rev(fd1 * seed, 1, zero, ctx))
        else:
            gE = _shift_fwd(fd5, 1, zero, ctx)   # west nbr's E prop.
            gW = _shift_rev(fd1, 1, zero, ctx)   # east nbr's W prop.
            newE = _affine_scan(gE, base, reverse=False, ctx=ctx,
                                seed=seed, depth=depth)
            newW = _affine_scan(gW, base, reverse=True, ctx=ctx,
                                seed=seed, depth=depth)
            new = newE + newW - base
        out_ref[asl] = new
        return jnp.concatenate(
            [new, new_planes[0][sl], new_planes[1][sl],
             new_planes[2][sl]], axis=0)

    carry[...] = jax.lax.fori_loop(0, bh, row_body, carry[...],
                                   unroll=bh if unroll == -1 else unroll)


def _mfd_scan_sweep(acc, w, props8, f, reverse, depth=0, unroll=1):
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

    old_set = (2, 3, 1) if not reverse else (6, 5, 7)
    in_specs = (
        [grid_blk(smap), xblk(), grid_blk(smap)]
        + [plane_blk(d) for d in range(8)]
        + [plane_xblk(d) for d in old_set]
    )
    return pl.pallas_call(
        functools.partial(_mfd_scan_kernel, bh=bh, f=f, reverse=reverse,
                          depth=depth, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((hf, L), jnp.float32),
        grid=(n,),
        in_specs=in_specs,
        out_specs=grid_blk(smap),
        scratch_shapes=[pltpu.VMEM((4 * f, L), jnp.float32)],
    )(acc, acc, w, *([props8] * 11))


def _mfd_sweep_order():
    """``RICHDEM_TPU_MFD_SWEEP_ORDER``: sweep sequence within a
    rotation.  ``rrcc`` (default): rowF, rowR, colF, colR — 2 transpose
    refolds per rotation.  ``rcrc``: rowF, colF, rowR, colR — 4
    refolds, but consecutive sweeps alternate axes, so a braid whose
    segments alternate row/col direction in that order collapses in
    fewer rotations.  Any order computes the same fixpoint (the
    rotation-level equality certifies it); only rotations-to-converge
    and refold overhead differ — probe before switching."""
    import os
    return os.environ.get("RICHDEM_TPU_MFD_SWEEP_ORDER", "rrcc")


@functools.partial(jax.jit,
                   static_argnames=("max_rotations", "fold_pad", "depth",
                                    "unroll", "order"))
def _mfd_scan_impl(props8, weights, max_rotations, fold_pad=_FOLD_PAD,
                   depth=0, unroll=1, order="rrcc"):
    """4-sweep scan rotation: row scans + column scans (via transposed
    refolds, plane permutation as in pallas_mfd).

    Divergent metrics braid flow through BOTH vertical directions
    repeatedly, so the 2-sweep row-scan rotation stays alternation-bound
    (Quinn: 17→20→85 rotations at 96/128/2048 — grows with size), while
    adding the column scans makes the count flat (~7 measured at
    96/128): any path segment monotone in EITHER axis resolves within
    one rotation.  6 dispatches per rotation like the folded engine, but
    converging in O(1) instead of O(diameter) rotations — the on-chip
    answer to [P2] §3-4's O(1)-round combine (SURVEY.md §5.7)."""
    from richdem_tpu.ops.pallas_sweeps import _PERM_TRANSPOSE

    h, wd = weights.shape
    f = _F
    props_p = jnp.stack([
        _fold(_pad_to(props8[d], 0.0, mh=fold_pad, mw=fold_pad), f)
        for d in range(8)])
    idx = np.array([_PERM_TRANSPOSE[d] - 1 for d in range(1, 9)])
    props_t = jnp.stack([
        _fold(_unfold(props_p[int(i_)], f).T, f) for i_ in idx])
    w_p = _pad_to(jnp.asarray(weights, jnp.float32), 0.0,
                  mh=fold_pad, mw=fold_pad)
    w_v = _fold(w_p, f)
    w_t = _fold(w_p.T, f)

    def _refold_T(x):
        return _fold(_unfold(x, f).T, f)

    def row_sweep(acc, reverse):
        return _mfd_scan_sweep(acc, w_v, props_p, f, reverse=reverse,
                               depth=depth, unroll=unroll)

    def col_sweep(acc, reverse):
        at = _mfd_scan_sweep(_refold_T(acc), w_t, props_t, f,
                             reverse=reverse, depth=depth, unroll=unroll)
        return _refold_T(at)

    if order == "rcrc":
        def rotation(acc):
            acc = row_sweep(acc, False)
            acc = col_sweep(acc, False)
            acc = row_sweep(acc, True)
            return col_sweep(acc, True)
    else:
        def rotation(acc):
            acc = row_sweep(acc, False)
            acc = row_sweep(acc, True)
            # back-to-back column sweeps share one refold round-trip
            at = _refold_T(acc)
            at = _mfd_scan_sweep(at, w_t, props_t, f, reverse=False,
                                 depth=depth, unroll=unroll)
            at = _mfd_scan_sweep(at, w_t, props_t, f, reverse=True,
                                 depth=depth, unroll=unroll)
            return _refold_T(at)

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


def mfd_accumulation_scan(props, weights=None, no_data_mask=None,
                          max_rotations=512, fold_min=None,
                          fold_pad=None, return_info=False):
    """Weighted upstream accumulation from (H, W, 8) proportions via
    scan-GS sweeps — 2 pallas calls per rotation, no transposed plane
    stacks.  Same contract as ``pallas_mfd.mfd_accumulation_gs``."""
    props = jnp.asarray(props)
    h, wd = props.shape[:2]
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
        return mfd_accumulation_gs(props, weights=weights,
                                   max_rotations=max_rotations,
                                   fold_min=fmin, fold_pad=fpad,
                                   return_info=return_info)
    props8 = jnp.moveaxis(props.astype(jnp.float32), -1, 0)
    acc, iters, done = _mfd_scan_impl(props8, weights, max_rotations,
                                      fold_pad=fpad,
                                      depth=_scan_depth(default=8),
                                      unroll=_scan_unroll(),
                                      order=_mfd_sweep_order())
    _require_converged(done, "scan-GS MFD accumulation", max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc


def d8_accumulation_scan(flowdirs, weights=None, no_data_mask=None,
                         max_rotations=64, fold_min=None, fold_pad=None,
                         return_info=False):
    """Exact D8 accumulation via scan-GS sweeps (2 pallas calls per
    rotation, all 8 directions covered).  Same contract as
    ``pallas_folded.d8_accumulation_folded``."""
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
    acc, iters, done = _accum_scan_impl(fd, weights, max_rotations,
                                        fold_pad=fpad,
                                        depth=_scan_depth(),
                                        unroll=_scan_unroll())
    _require_converged(done, "scan-GS D8 accumulation", max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc


# ---------------------------------------------------------------------------
# Scan-GS fill: the same 2-sweeps-per-rotation structure for the
# Priority-Flood fixpoint
# ---------------------------------------------------------------------------
#
# The fill fixpoint  w[i] = max(z[i], min_n (w[n] + ε_n))  has the same
# sweep structure as accumulation but in (min, +) with a floor clamp.
# Within a row (fixed vertical candidates), the Gauss–Seidel limit is
#
#     new[j] = min(wr[j], max(fr[j], min(vc[j], new[j−1]+ε, new[j+1]+ε)))
#
# and because 1-D paths are monotone (a path that backtracks revisits a
# cell with ≥ the prefix value: every step adds ε ≥ 0 and clamps only
# raise), the limit splits into independent directional passes
# new = min(F, G) with  F[j] = clip(F[j−1]+ε, fr[j], B[j]),
# B = min(wr, max(fr, vc)).  The maps  x → clip(x+s, lo, hi)  are closed
# under composition:
#
#     (h₂∘h₁)(x) = clip(x + s₁ + s₂, clip(lo₁+s₂, lo₂, hi₂),
#                                     clip(hi₁+s₂, lo₂, hi₂))
#
# so a Hillis–Steele scan over (lo, hi) pairs — the shift after step d is
# the static d·ε — evaluates F exactly in log₂ W generalized lane shifts,
# with identity out-of-range prefixes ((−BIG, +BIG) shift fills) and the
# off-grid drain applied at the end (F = M(−BIG) = lo_final).  fr ≤ B
# holds invariantly (w ≥ floor throughout), which is what makes
# min(B, max(fr, ·)) a clip at all.
#
# A forward sweep then sees all 8 neighbors — row above NEW (straight ε,
# diagonals ε_d), both in-row directions NEW via the clamp scans, row
# below OLD — and a rotation is 2 pallas calls with no transpose refolds,
# converging in O(vertical direction alternations) like the accumulation
# scans.  Per-sweep change flags remain sound: the fill is a selection
# fixpoint, so sweeps are idempotent exactly at convergence (see
# pallas_folded._fill_kernel).

def _clamp_scan(lo, hi, jeh, reverse, ctx, seed=None, depth=0):
    """F[j] for the directional pass — lo/hi are the per-cell clip maps
    (floor, B); returns the composed lower clamp applied to a −BIG
    (off-grid drain) origin.

    Runs in TILTED coordinates v[j] = w[j] ∓ j·ε (``jeh`` = flat-index·ε,
    sign by direction): there the recurrence is the PURE clamp chain
    F'[j] = clip(F'[j∓1], lo'[j], hi'[j]) — min/max only, exactly
    associative, no accumulating ε additions.  The naive scan's per-level
    ``+d·ε`` regroups the float sums differently from the sequential
    sweep, so at the analytic fixpoint it returns values an ulp below the
    stored state and the monotone iteration creeps for hundreds of
    rotations (measured on the walled-serpentine pit); the tilted chain
    is selection-valued, hence bit-stable under recomputation.

    ``depth``/``seed`` (RICHDEM_TPU_SCAN_DEPTH): truncate the window and
    apply the composed clip to the OLD row value at distance d instead
    of the −BIG origin — exact at the fixpoint (the sequential chain
    composed d steps IS the window map applied to w*[j∓d]); chains
    longer than the depth settle over extra rotations."""
    f, L = lo.shape
    w = f * L
    lim, seeding = _win_lim(depth, w, seed)
    shift = _shift_rev if reverse else _shift_fwd
    neg = jnp.float32(-BIG)
    pos = jnp.float32(BIG)
    t = -jeh if reverse else jeh
    lo = lo - t
    hi = hi - t
    d = 1
    while d < lim:
        lo2 = jnp.clip(shift(lo, d, neg, ctx), lo, hi)
        if d * 2 < lim or seeding:
            # the upper clamp of the last step is dead unless a seed
            # is clipped through the composed window afterwards
            hi = jnp.clip(shift(hi, d, pos, ctx), lo, hi)
        lo = lo2
        d *= 2
    if seeding:
        return jnp.clip(shift(seed - t, d, neg, ctx), lo, hi) + t
    return lo + t


def _fill_scan_kernel(eps_ref, w_ref, floor_ref, out_ref,
                      flag_ref, carry, *, bh, f, reverse, depth=0,
                      unroll=1):
    """One scan-GS fill sweep + in-kernel change flag (same convergence
    contract as pallas_folded._fill_kernel).

    Deliberately NO old-side (unprocessed-row) candidates, unlike the
    accumulation scans: fill cells mutually constrain their neighbors, so
    old-side peeks make row r's value depend on row r+1's CURRENT value
    and vice versa — each side then keeps re-rounding off the other's
    last-ulp updates and the exact-equality fixpoint takes tens of extra
    rotations to settle (measured on the walled-serpentine pit: 27 vs 2).
    Without them every sweep output is a deterministic expression of
    already-settled rows only, so cells settle in spill-tree order
    exactly as in the folded kernel.  (That invariant holds at the
    default depth=0: a truncated run seeds the clamp scans with the
    row's OWN old values, reintroducing exactly this dependence — the
    acceptance guard below is what keeps the eps>0 churn bounded
    there.)  Coverage per rotation is still all
    8 neighbors: forward = row above NEW + both in-row; reverse = row
    below NEW + both in-row."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # off-grid row beyond the first processed strip: a drain
        carry[...] = jnp.full(carry.shape, -BIG, carry.dtype)
        flag_ref[...] = jnp.zeros(flag_ref.shape, jnp.int32)

    neg = jnp.float32(-BIG)
    eps = eps_ref[0]
    eps_d = eps_ref[1]
    ctx = _iota_ctx((f, w_ref.shape[-1]))
    jeh = ctx[1].astype(jnp.float32) * eps  # flat-index tilt field
    tmax = jnp.float32(f * w_ref.shape[-1] - 1) * eps

    def row_body(k, state):
        prev, diff = state
        r = (bh - 1 - k) if reverse else k
        sl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        wr = w_ref[sl]
        fr = floor_ref[sl]

        # processed neighbor row (NEW values): straight + both diagonals
        vc = jnp.minimum(prev + eps,
                         jnp.minimum(_shift_fwd(prev, 1, neg, ctx),
                                     _shift_rev(prev, 1, neg, ctx))
                         + eps_d)

        b = jnp.minimum(wr, jnp.maximum(fr, vc))
        seed = wr if depth else None
        lat = jnp.minimum(_clamp_scan(fr, b, jeh, False, ctx,
                                      seed=seed, depth=depth),
                          _clamp_scan(fr, b, jeh, True, ctx,
                                      seed=seed, depth=depth))
        # Accept a lateral-chain value only when it beats the no-lateral
        # candidate by more than the tilt arithmetic's own noise floor
        # (~ulp(|b| + t_max) per ±t round trip).  Without the guard, an
        # ε-ramp surface (walled-serpentine pit) keeps re-rounding one
        # ulp lower each sweep and the exact-equality fixpoint takes
        # tens of extra rotations; with ε = 0 the chain is pure min/max
        # selections and the guard term is exactly zero.
        guard = jnp.where(eps > 0,
                          (jnp.abs(b) + tmax) * jnp.float32(2.0 ** -21),
                          jnp.float32(0.0))
        new = jnp.where(lat < b - guard, lat, b)
        out_ref[sl] = new
        return new, diff | (new != wr).astype(jnp.int32)

    fin, diff = jax.lax.fori_loop(
        0, bh, row_body,
        (carry[...], jnp.zeros(carry.shape, jnp.int32)),
        unroll=bh if unroll == -1 else unroll)
    carry[...] = fin
    chg = jnp.any(diff != 0)

    @pl.when(chg)
    def _():
        flag_ref[...] = jnp.ones(flag_ref.shape, jnp.int32)


def _fill_scan_sweep(w, floor, eps2, f, reverse, depth=0, unroll=1):
    from richdem_tpu.ops.pallas_folded import _strip_maps

    hf, L = w.shape
    h = hf // f
    bh = _fold_strip_height(h, L * f, n_bufs=3)
    n = h // bh
    smap, _ = _strip_maps(n, bh, reverse)

    def blk(m):
        return pl.BlockSpec((bh * f, L), lambda i, eps, _m=m: (_m(i), 0),
                            memory_space=pltpu.VMEM)

    flag_blk = pl.BlockSpec((8, 128), lambda i, eps: (0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[blk(smap), blk(smap)],
        out_specs=[blk(smap), flag_blk],
        scratch_shapes=[pltpu.VMEM((f, L), jnp.float32)],
    )
    out, flag = pl.pallas_call(
        functools.partial(_fill_scan_kernel, bh=bh, f=f, reverse=reverse,
                          depth=depth, unroll=unroll),
        out_shape=[jax.ShapeDtypeStruct((hf, L), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        grid_spec=grid_spec,
    )(eps2, w, floor)
    return out, flag[0, 0]


@functools.partial(jax.jit, static_argnames=("max_iters", "check_every",
                                             "fold_pad", "depth",
                                             "unroll"))
def _fill_scan_impl(z32, nodata_mask, w0, eps2, *, max_iters,
                    check_every, fold_pad, depth=0, unroll=1):
    h, wd = z32.shape
    neg = jnp.float32(-BIG)
    floor = jnp.where(nodata_mask, neg, z32)
    w0 = jnp.where(nodata_mask, neg, w0)

    f = _F
    floor_v = _fold(_pad_to(floor, -BIG, mh=fold_pad, mw=fold_pad), f)
    wv = _fold(_pad_to(w0, -BIG, mh=fold_pad, mw=fold_pad), f)

    def rotation(wv):
        wv, c1 = _fill_scan_sweep(wv, floor_v, eps2, f, reverse=False,
                                  depth=depth, unroll=unroll)
        wv, c2 = _fill_scan_sweep(wv, floor_v, eps2, f, reverse=True,
                                  depth=depth, unroll=unroll)
        return wv, c1 + c2

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
        return new, it + check_every, changed == 0

    done0 = jnp.any(wv != wv)
    wv, iters, done = jax.lax.while_loop(cond, body,
                                         (wv, jnp.int32(0), done0))
    filled = _unfold(wv, f)[:h, :wd]
    return jnp.where(nodata_mask, z32, filled), iters, done


def fill_fixpoint_scan(z, nodata_mask=None, eps=0.0, eps_diag=None,
                       max_iters=256, check_every=1, w0=None,
                       multiscale=True, fold_min=None, fold_pad=None,
                       multiscale_min=None):
    """Scan-GS fill: same (filled, iters, converged) contract as
    ``pallas_folded.fill_fixpoint_folded``, 2 pallas calls per rotation
    (vs 4 sweeps + 2 transpose refolds), in-row runs resolved exactly by
    the clamp scans.  Cites reference ``Barnes2014.hpp`` Priority-Flood
    semantics (SURVEY.md §2.2); engine selection via
    ``RICHDEM_TPU_FILL_ENGINE``."""
    from richdem_tpu.ops import pallas_folded as _PF
    from richdem_tpu.ops.pallas_folded import (_coarse_warm_start,
                                               fill_fixpoint_folded)

    z32 = jnp.asarray(z, jnp.float32)
    h, wd = z32.shape
    fmin = _PF._FOLD_MIN if fold_min is None else fold_min
    fpad = _FOLD_PAD if fold_pad is None else fold_pad
    msmin = (_PF._MULTISCALE_MIN if multiscale_min is None
             else multiscale_min)
    if max(h, wd) < fmin:
        return fill_fixpoint_folded(
            z, nodata_mask, eps=eps, eps_diag=eps_diag,
            max_iters=max_iters, check_every=check_every, w0=w0,
            multiscale=multiscale, fold_min=fold_min, fold_pad=fold_pad,
            multiscale_min=multiscale_min)
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
    return _fill_scan_impl(z32, nodata_mask, w0, eps2,
                           max_iters=max_iters, check_every=check_every,
                           fold_pad=fpad, depth=_scan_depth(),
                           unroll=_scan_unroll())


# ---------------------------------------------------------------------------
# Scan-GS masked distances (flat resolution): tropical min-plus scans
# ---------------------------------------------------------------------------
#
# The flat-resolution BFS fixpoints (ops/flats.py — "towards"/"away"/
# "maxd" masked distances, reference ``flat_resolution.hpp`` semantics
# per SURVEY.md §2.2) are min-plus shortest paths over unit (or zero)
# step costs gated by per-edge admissibility.  In-row the GS limit is
# new[j] = min(b[j], a[j] + new[j∓1]) with a[j] ∈ {step, +∞}: tropical
# affine maps x → min(b, x + a), composed (a₁,b₁)→(a₂,b₂) =
# (a₁+a₂, min(b₂, b₁+a₂)) — associative, and EXACT here: distances are
# small integers (·step) and the ∞ sentinel BIG stays ≥ BIG under ≤ 2¹²
# additions, so unlike the ε-fill chains no tilt or acceptance guard is
# needed and per-sweep change flags detect the selection fixpoint
# soundly.  A rotation is 2 pallas calls over the folded (f, L) layout
# (vs 4 strip-sequential (1, W) sweeps + per-rotation transposes of the
# working raster in ops/pallas_sweeps.dist_fixpoint_pallas), full VPU
# sublane utilization included.

def _tropical_scan(a, b, reverse, ctx, seed=None, depth=0):
    """Solve new[j] = min(b[j], a[j] + new[j∓1]) exactly (row-local);
    out-of-row prefix is the identity map (a = 0, b = +∞) and the
    origin x₀ = +∞, so the result is the composed b.

    ``depth``/``seed``: truncated window closed with the OLD row values
    (min-plus composition applied to w*[j∓d] reproduces the fixpoint
    exactly; longer chains cost extra rotations)."""
    f, L = a.shape
    w = f * L
    lim, seeding = _win_lim(depth, w, seed)
    shift = _shift_rev if reverse else _shift_fwd
    big = jnp.float32(BIG)
    zero = jnp.float32(0.0)
    d = 1
    while d < lim:
        b = jnp.minimum(b, shift(b, d, big, ctx) + a)
        if d * 2 < lim or seeding:
            a = shift(a, d, zero, ctx) + a
        d *= 2
    if seeding:
        b = jnp.minimum(b, shift(seed, d, big, ctx) + a)
    return b


def _dist_scan_kernel(w_ref, z_ref, s_ref, out_ref, flag_ref,
                      c_w, c_z, c_s, *, bh, f, reverse, mode, step,
                      depth=0, unroll=1):
    """One scan-GS masked-distance sweep + in-kernel change flag (same
    admissibility predicates as pallas_sweeps._dist_down_kernel)."""
    from richdem_tpu.ops.pallas_sweeps import _allowed

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # no off-grid sources: flats never touch the padding
        c_w[...] = jnp.full(c_w.shape, BIG, c_w.dtype)
        c_z[...] = jnp.full(c_z.shape, 3.0e37, c_z.dtype)
        c_s[...] = jnp.zeros(c_s.shape, c_s.dtype)
        flag_ref[...] = jnp.zeros(flag_ref.shape, jnp.int32)

    big = jnp.float32(BIG)
    zbig = jnp.float32(3.0e37)
    stepf = jnp.float32(step)
    ctx = _iota_ctx((f, w_ref.shape[-1]))

    def row_body(k, state):
        prevw, prevz, prevs, diff = state
        r = (bh - 1 - k) if reverse else k
        sl = (pl.ds(pl.multiple_of(r * f, f), f), slice(None))
        wr = w_ref[sl]
        z = z_ref[sl]
        s = s_ref[sl]

        # processed neighbor row (NEW values): straight + both diagonals
        cand = jnp.where(_allowed(mode, z, prevz, s, prevs),
                         prevw + stepf, big)
        zl = _shift_fwd(prevz, 1, zbig, ctx)
        sl_ = _shift_fwd(prevs, 1, jnp.int32(0), ctx)
        cand = jnp.minimum(cand, jnp.where(
            _allowed(mode, z, zl, s, sl_),
            _shift_fwd(prevw, 1, big, ctx) + stepf, big))
        zr = _shift_rev(prevz, 1, zbig, ctx)
        sr = _shift_rev(prevs, 1, jnp.int32(0), ctx)
        cand = jnp.minimum(cand, jnp.where(
            _allowed(mode, z, zr, s, sr),
            _shift_rev(prevw, 1, big, ctx) + stepf, big))
        b = jnp.minimum(wr, cand)

        # both in-row chains via tropical scans
        aE = jnp.where(_allowed(mode, z, _shift_fwd(z, 1, zbig, ctx), s,
                                _shift_fwd(s, 1, jnp.int32(0), ctx)),
                       stepf, big)
        aW = jnp.where(_allowed(mode, z, _shift_rev(z, 1, zbig, ctx), s,
                                _shift_rev(s, 1, jnp.int32(0), ctx)),
                       stepf, big)
        seed = wr if depth else None
        new = jnp.minimum(_tropical_scan(aE, b, reverse=False, ctx=ctx,
                                         seed=seed, depth=depth),
                          _tropical_scan(aW, b, reverse=True, ctx=ctx,
                                         seed=seed, depth=depth))
        out_ref[sl] = new
        return new, z, s, diff | (new != wr).astype(jnp.int32)

    fw, fz, fs, diff = jax.lax.fori_loop(
        0, bh, row_body,
        (c_w[...], c_z[...], c_s[...],
         jnp.zeros(c_w.shape, jnp.int32)),
        unroll=bh if unroll == -1 else unroll)
    c_w[...] = fw
    c_z[...] = fz
    c_s[...] = fs
    chg = jnp.any(diff != 0)

    @pl.when(chg)
    def _():
        flag_ref[...] = jnp.ones(flag_ref.shape, jnp.int32)


def _dist_scan_sweep(w, z, s, f, reverse, mode, step, depth=0,
                     unroll=1):
    hf, L = w.shape
    h = hf // f
    bh = _fold_strip_height(h, L * f, n_bufs=4)
    n = h // bh
    smap, _ = _strip_maps(n, bh, reverse)

    def blk(m):
        return pl.BlockSpec((bh * f, L), lambda i, _m=m: (_m(i), 0),
                            memory_space=pltpu.VMEM)

    flag_blk = pl.BlockSpec((8, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out, flag = pl.pallas_call(
        functools.partial(_dist_scan_kernel, bh=bh, f=f, reverse=reverse,
                          mode=mode, step=step, depth=depth,
                          unroll=unroll),
        out_shape=[jax.ShapeDtypeStruct((hf, L), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)],
        grid=(n,),
        in_specs=[blk(smap), blk(smap), blk(smap)],
        out_specs=[blk(smap), flag_blk],
        scratch_shapes=[pltpu.VMEM((f, L), jnp.float32),
                        pltpu.VMEM((f, L), jnp.float32),
                        pltpu.VMEM((f, L), jnp.int32)],
    )(w, z, s)
    return out, flag[0, 0]


@functools.partial(jax.jit, static_argnames=("mode", "step", "max_iters",
                                             "fold_pad", "depth",
                                             "unroll"))
def _dist_scan_impl(w0, zed, state, mode, step, max_iters, fold_pad,
                    depth=0, unroll=1):
    h, wd = w0.shape
    f = _F
    w_v = _fold(_pad_to(jnp.asarray(w0, jnp.float32), BIG,
                        mh=fold_pad, mw=fold_pad), f)
    z_v = _fold(_pad_to(jnp.asarray(zed, jnp.float32), 3.0e37,
                        mh=fold_pad, mw=fold_pad), f)
    s_v = _fold(_pad_to(jnp.asarray(state, jnp.int32), 0,
                        mh=fold_pad, mw=fold_pad), f)

    def cond(st):
        _, it, done = st
        return jnp.logical_and(~done, it < max_iters)

    def body(st):
        w, it, _ = st
        w, c1 = _dist_scan_sweep(w, z_v, s_v, f, reverse=False,
                                 mode=mode, step=step, depth=depth,
                                 unroll=unroll)
        w, c2 = _dist_scan_sweep(w, z_v, s_v, f, reverse=True,
                                 mode=mode, step=step, depth=depth,
                                 unroll=unroll)
        return w, it + 1, (c1 + c2) == 0

    done0 = jnp.any(w_v != w_v)
    w, iters, done = jax.lax.while_loop(cond, body,
                                        (w_v, jnp.int32(0), done0))
    return _unfold(w, f)[:h, :wd], iters, done


def dist_fixpoint_scan(w0, zed, state, mode, step=1.0, max_iters=256,
                       fold_pad=None, return_info=False, depth=None):
    """Scan-GS masked-distance fixpoint — same contract as
    ``pallas_sweeps.dist_fixpoint_pallas`` but takes the raw
    (elevation, state-flag) rasters instead of a precomputed shifted/
    transposed context (the scan kernels shift in-kernel)."""
    fpad = _FOLD_PAD if fold_pad is None else fold_pad
    if depth is None:
        depth = _scan_depth()
    w, iters, done = _dist_scan_impl(w0, zed, state, mode, float(step),
                                     max_iters, fpad, depth=depth,
                                     unroll=_scan_unroll())
    if return_info:
        return w, iters, done
    return w
