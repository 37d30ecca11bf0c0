"""Flow accumulation by parallel upstream propagation (device ops).

Device counterpart of the reference's topological-queue engine
(``methods/flow_accumulation_generic.hpp`` — SURVEY.md §2.2, §3.2,
appendix A.6).  Two strategies, both queue-free:

* **Jacobi fixpoint** (any metric): ``A ← w + Pᵀ A`` where ``Pᵀ A`` is one
  fused 8-direction stencil (inflow from each neighbor that routes toward
  us).  ``P`` is nilpotent on the post-fill DAG, so iteration converges in
  longest-flow-path steps.  Used for multi-flow metrics and as a
  cross-check.
* **Gauss–Seidel line sweeps** (the TPU fast path, Pallas kernels in
  ``ops.pallas_folded``/``ops.pallas_mfd``): one directional sweep
  resolves every monotone flow-path segment, so a few rotations converge
  where Jacobi needs O(longest-path) iterations.  Pointer doubling
  (``succ_k = succ^{2^k}``, ⌈log₂ L⌉ scatter rounds) is retained as a
  cross-check; scatters serialize on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from richdem_tpu.ops.stencil import neighbor
from richdem_tpu.topology import DX, DY, D8_INVERSE

__all__ = ["flow_accumulation_from_props", "d8_accumulation",
           "d8_accumulation_doubling", "accumulation_jacobi_info"]


def _inflow_step(acc, props):
    """One application of Pᵀ: total inflow into each cell.

    ``props``: (H, W, 8).  The neighbor in direction d sends us its
    ``acc * props[..., inverse(d)-1]``."""
    total = jnp.zeros_like(acc)
    for d in range(1, 9):
        inv = int(D8_INVERSE[d])
        contrib = acc * props[..., inv - 1]
        total = total + neighbor(contrib, d, 0.0)
    return total


@partial(jax.jit, static_argnames=("max_iters", "check_every"))
def accumulation_jacobi_info(props, weights=None, max_iters=4096,
                             check_every=8):
    """Jacobi accumulation; returns ``(accum, iters, converged)``."""
    props = jnp.asarray(props)
    h, w, _ = props.shape
    dtype = props.dtype if props.dtype == jnp.float64 else jnp.float32
    if weights is None:
        weights = jnp.ones((h, w), dtype)
    else:
        weights = jnp.asarray(weights, dtype)
    props = props.astype(dtype)

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_iters)

    def body(state):
        acc, it, _ = state
        new = acc
        for _ in range(check_every):
            new = weights + _inflow_step(new, props)
        done = jnp.all(new == acc)
        return new, it + check_every, done

    acc0 = weights
    acc, iters, done = jax.lax.while_loop(
        cond, body, (acc0, jnp.int32(0), jnp.bool_(False)))
    return acc, iters, done


def flow_accumulation_from_props(props, weights=None, no_data_mask=None,
                                 max_iters=4096, return_info=False):
    """Weighted upstream accumulation from (H, W, 8) proportions.

    Nodata cells must already have zero proportions (they do, from
    :mod:`richdem_tpu.ops.flowdirs`); the mask only zeroes their output.
    On TPU this runs the Pallas GS sweeps (engine-dispatching, see
    ``pallas_mfd.mfd_accumulation_gs``).  ``return_info`` additionally
    returns ``(rotations, converged)``."""
    if jax.default_backend() == "tpu":
        from richdem_tpu.ops.pallas_mfd import mfd_accumulation_gs
        return mfd_accumulation_gs(props, weights=weights,
                                   no_data_mask=no_data_mask,
                                   return_info=return_info)
    acc, iters, done = accumulation_jacobi_info(props, weights,
                                                max_iters=max_iters)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc


def dinf_accumulation_from_angles(angles, weights=None, no_data_mask=None,
                                  return_info=False):
    """D∞ accumulation straight from the Tarboton angle raster.

    TPU: the two-tap folded GS kernel (:mod:`richdem_tpu.ops.pallas_dinf`
    — ~half the HBM traffic of the generic 8-plane path, same fixpoint).
    Elsewhere: decoded proportions through the generic engine.
    ``return_info`` additionally returns ``(rotations, converged)``."""
    if jax.default_backend() == "tpu":
        from richdem_tpu.ops.pallas_dinf import (dinf_accumulation_gs,
                                                 dinf_two_tap)
        code, p = dinf_two_tap(jnp.asarray(angles))
        return dinf_accumulation_gs(code, p, weights=weights,
                                    no_data_mask=no_data_mask,
                                    return_info=return_info)
    from richdem_tpu.ops.flowdirs import proportions_from_dinf
    props = proportions_from_dinf(jnp.asarray(angles))
    acc, iters, done = accumulation_jacobi_info(props, weights)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    if return_info:
        return acc, iters, done
    return acc


# -- D8 pointer doubling ------------------------------------------------

@partial(jax.jit, static_argnames=("rounds",))
def _d8_doubling_impl(flowdirs, weights, rounds):
    fd = jnp.asarray(flowdirs).astype(jnp.int32)
    h, w = fd.shape
    n = h * w
    sink = n  # virtual terminal: NO_FLOW / nodata / off-grid flows here

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    dy = jnp.asarray(np.asarray(DY, np.int32))[fd.clip(0)]
    dx = jnp.asarray(np.asarray(DX, np.int32))[fd.clip(0)]
    nr, nc = rows + dy, cols + dx
    valid = (fd > 0) & (nr >= 0) & (nr < h) & (nc >= 0) & (nc < w)
    succ0 = jnp.where(valid, nr * w + nc, sink).reshape(-1)
    succ0 = jnp.append(succ0, sink)  # sink loops to itself

    acc0 = jnp.append(weights.reshape(-1), 0.0)

    def body(_, state):
        succ, acc = state
        # add my accumulated upstream mass to my 2^k-th successor …
        acc = acc.at[succ].add(jnp.where(
            jnp.arange(n + 1) < n, acc, 0.0))
        # … and square the successor pointer
        succ = succ[succ]
        return succ, acc

    _, acc = jax.lax.fori_loop(0, rounds, body, (succ0, acc0))
    return acc[:n].reshape(h, w)


def d8_accumulation_doubling(flowdirs, weights=None, no_data_mask=None,
                             rounds=None):
    """Exact D8 accumulation in ⌈log₂(n)⌉ scatter-add rounds.

    Log-depth but scatter-bound on TPU (~100M random accesses/s); prefer
    :func:`d8_accumulation` (Gauss–Seidel line sweeps) for large grids."""
    fd = jnp.asarray(flowdirs)
    h, w = fd.shape
    if weights is None:
        weights = jnp.ones((h, w), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    if no_data_mask is not None:
        weights = jnp.where(jnp.asarray(no_data_mask), 0.0, weights)
    if rounds is None:
        rounds = max(1, int(np.ceil(np.log2(max(h * w, 2)))))
    acc = _d8_doubling_impl(fd, weights, rounds)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    return acc


# -- D8 Gauss–Seidel directional line sweeps ----------------------------
#
# The fast path on TPU.  One "sweep" processes grid lines sequentially in
# one of the 4 axis directions (lax.scan over lines); within a step the
# new values of the previous line feed the current line, so any flow-path
# segment that advances monotonically in the sweep direction is resolved
# in ONE sweep regardless of its length.  Measured on fractal terrain,
# flow paths change x (or y) direction at most ~once (valley runs are
# monotone), so a few E/S/W/N rotations converge where Jacobi needs
# O(longest-path) = O(grid-size) iterations and pointer doubling needs
# ~27 scatter rounds.  This is the single-chip analog of the reference's
# wave-of-sweeps design philosophy, applied to the accumulation recurrence
# A = w + Pᵀ A (a linear Gauss–Seidel splitting: monotone nondecreasing,
# exact-equality convergence detection).

def _code_remap(fd, perm):
    """Remap direction codes under a grid transform (tiny select chain)."""
    out = fd
    for src in range(1, 9):
        dst = perm[src]
        if dst != src:
            out = jnp.where(fd == src, jnp.int8(dst), out)
    return out

#: code permutations under grid transforms
_PERM_FLIPUD = {0: 0, 1: 1, 2: 8, 3: 7, 4: 6, 5: 5, 6: 4, 7: 3, 8: 2}
_PERM_TRANSPOSE = {0: 0, 1: 3, 2: 2, 3: 1, 4: 8, 5: 7, 6: 6, 7: 5, 8: 4}


def _roll_up(x):
    """x[r+1] at row r (value from the next line), zero at the last row."""
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)


def _roll_down(x):
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def _shift_w(v):  # value of west neighbor within a line vector (W,)
    return jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]], axis=0)


def _shift_e(v):
    return jnp.concatenate([v[1:], jnp.zeros_like(v[:1])], axis=0)


def _gs_down_sweep(acc, w, fd):
    """One top→bottom Gauss–Seidel sweep of A = w + Pᵀ A.

    Contributions from the previous (above) line use NEW values; the
    within-line and next-line contributions use the old ``acc``."""
    fd_prev = _roll_down(fd)       # line r-1's codes, aligned to line r
    fd_next = _roll_up(fd)
    acc_next = _roll_up(acc)

    xs = (w, fd, fd_prev, fd_next, acc, acc_next)

    def body(prev_new, x):
        w_l, fd_l, fdp, fdn, a_l, a_n = x
        # NEW: from the line above — straight S(7), SE(6) from west
        # source, SW(8) from east source.
        newc = (prev_new * (fdp == 7)
                + _shift_w(prev_new * (fdp == 6))
                + _shift_e(prev_new * (fdp == 8)))
        # OLD: from the line below — N(3), NE(4) from west src, NW(2)
        # from east src.
        oldb = (a_n * (fdn == 3)
                + _shift_w(a_n * (fdn == 4))
                + _shift_e(a_n * (fdn == 2)))
        # OLD: within the line — E(5) from west neighbor, W(1) from east.
        oldl = _shift_w(a_l * (fd_l == 5)) + _shift_e(a_l * (fd_l == 1))
        new = w_l + newc + oldb + oldl
        return new, new

    _, out = jax.lax.scan(body, jnp.zeros_like(acc[0]), xs)
    return out


def _gs_rotation(acc, w, fd, fd_t):
    """One full E, S, W, N rotation of directional GS sweeps."""
    # S-sweep (identity orientation)
    acc = _gs_down_sweep(acc, w, fd)
    # N-sweep (flipud)
    acc = jnp.flipud(_gs_down_sweep(jnp.flipud(acc), jnp.flipud(w),
                                    jnp.flipud(fd_t["ud"])))
    # E-sweep (transpose)
    acc = _gs_down_sweep(acc.T, w.T, fd_t["tr"]).T
    # W-sweep (transpose + flip)
    acc = jnp.flipud(_gs_down_sweep(
        jnp.flipud(acc.T), jnp.flipud(w.T), jnp.flipud(fd_t["trud"]))).T
    return acc


@partial(jax.jit, static_argnames=("max_rotations",))
def _d8_gs_impl(flowdirs, weights, max_rotations=64):
    fd = jnp.asarray(flowdirs).astype(jnp.int8)
    w = weights
    # Precompute code-remapped flow directions for each orientation.
    fd_t = {
        "ud": _code_remap(fd, _PERM_FLIPUD),
        "tr": _code_remap(fd.T, _PERM_TRANSPOSE),
    }
    fd_t["trud"] = _code_remap(fd_t["tr"], _PERM_FLIPUD)

    def cond(state):
        _, it, done = state
        return jnp.logical_and(~done, it < max_rotations)

    def body(state):
        acc, it, _ = state
        new = _gs_rotation(acc, w, fd, fd_t)
        return new, it + 1, jnp.all(new == acc)

    done0 = jnp.any(w != w)
    acc, iters, done = jax.lax.while_loop(cond, body,
                                          (w, jnp.int32(0), done0))
    return acc, iters, done


def d8_accumulation(flowdirs, weights=None, no_data_mask=None,
                    max_rotations=64):
    """Exact D8 accumulation via Gauss–Seidel directional line sweeps —
    the TPU fast path (see block comment above).  On TPU the sweeps run
    as Pallas strip kernels (``ops.pallas_sweeps``)."""
    if jax.default_backend() == "tpu":
        from richdem_tpu.ops.pallas_folded import d8_accumulation_gs
        return d8_accumulation_gs(flowdirs, weights=weights,
                                  no_data_mask=no_data_mask,
                                  max_rotations=max_rotations)
    fd = jnp.asarray(flowdirs)
    h, wdt = fd.shape
    if weights is None:
        weights = jnp.ones((h, wdt), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    if no_data_mask is not None:
        weights = jnp.where(jnp.asarray(no_data_mask), 0.0, weights)
    acc, _, done = _d8_gs_impl(fd, weights, max_rotations=max_rotations)
    from richdem_tpu.ops.pallas_folded import _require_converged
    _require_converged(done, "D8 GS accumulation", max_rotations)
    if no_data_mask is not None:
        acc = jnp.where(jnp.asarray(no_data_mask), 0.0, acc)
    return acc
